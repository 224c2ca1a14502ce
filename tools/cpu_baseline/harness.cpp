/* Headless benchmark + golden-dump harness around the reference C++ render core.
 *
 * The reference core (render-cpp/render.cpp) is compiled IN PLACE from
 * /root/reference (read-only) against the Linux simd shim in shims/; this file
 * only drives it: allocate a pixel buffer, feed Input structs, time
 * updateAndRender(), and optionally dump frames as PPM for cross-checking the
 * framework's golden renderer against the reference binary. See BASELINE.md.
 *
 * The core locates data.bin relative to its own binary (render.cpp:160-176
 * probes <bindir>/data.bin first), so the runner copies the scene next to the
 * executable.
 */
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>

#include "render.hpp"

extern "C" void updateAndRender(const PixelData *, const Input *);

static double now_s() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

static void dump_ppm(const char *path, const PixelData &pd) {
    FILE *f = fopen(path, "wb");
    if (!f) { perror("dump"); exit(1); }
    fprintf(f, "P6\n%u %u\n255\n", pd.width, pd.height);
    for (uint32_t i = 0; i < pd.width * pd.height; i++) {
        uint32_t p = pd.buffer[i];
        unsigned char rgb[3] = {(unsigned char)(p >> 16), (unsigned char)(p >> 8),
                                (unsigned char)p};
        fwrite(rgb, 1, 3, f);
    }
    fclose(f);
}

int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr,
                "usage: %s W H FRAMES [--fly] [--dump out.ppm]\n"
                "  --fly   hold W pressed (forward) with a slow mouse turn\n",
                argv[0]);
        return 2;
    }
    uint32_t w = atoi(argv[1]), h = atoi(argv[2]);
    int frames = atoi(argv[3]);
    bool fly = false;
    const char *dump = nullptr;
    for (int i = 4; i < argc; i++) {
        if (!strcmp(argv[i], "--fly")) fly = true;
        else if (!strcmp(argv[i], "--dump") && i + 1 < argc) dump = argv[++i];
    }

    PixelData pd;
    pd.width = w;
    pd.height = h;
    pd.bytesPerPixel = 4;
    pd.bufferSize = 4 * w * h;
    pd.buffer = (uint32_t *)malloc(pd.bufferSize);

    Input in;
    memset(&in, 0, sizeof(in));

    updateAndRender(&pd, &in); /* first call loads data.bin + warms caches */

    double t0 = now_s();
    for (int f = 0; f < frames; f++) {
        if (fly) {
            in.up = 2.0f;
            in.mouse.x += 1.0f;
        }
        updateAndRender(&pd, &in);
    }
    double dt = (now_s() - t0) / frames;

    /* checksum so the render can't be optimized away and runs are comparable */
    uint64_t sum = 0;
    for (uint32_t i = 0; i < w * h; i++) sum += pd.buffer[i];

    if (dump) dump_ppm(dump, pd);

    printf("{\"width\": %u, \"height\": %u, \"frames\": %d, \"ms_per_frame\": %.4f, "
           "\"fps\": %.3f, \"checksum\": %llu}\n",
           w, h, frames, dt * 1e3, 1.0 / dt, (unsigned long long)sum);
    return 0;
}
