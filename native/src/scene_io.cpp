/* data.bin scene IO — byte layout per swift3drenderer_tpu/utils/databin.py
 * (reference format: data-generator/main.swift:387-416, loader
 * render/render.swift:137-175). Validation happens at load time; the reference
 * instead aborts mid-render on malformed scenes (render.swift:196,317). */

#include <cstdarg>
#include <cstdio>
#include <cstring>
#include <exception>

#include "internal.h"

static thread_local char g_error[512];
static thread_local bool g_has_error = false;

void s3d_set_error(const char *fmt, ...) {
    va_list ap;
    va_start(ap, fmt);
    vsnprintf(g_error, sizeof(g_error), fmt, ap);
    va_end(ap);
    g_has_error = true;
}

extern "C" const char *s3d_last_error(void) {
    return g_has_error ? g_error : nullptr;
}

bool s3d_scene::validate(const char **err) const {
    static thread_local char buf[256];
    *err = nullptr;
    int64_t ni = (int64_t)vertex_indices.size();
    if (ni % 3) { *err = "vertex index count not a multiple of 3"; return false; }
    if ((int64_t)attribute_indices.size() != ni) {
        *err = "attribute index count != vertex index count"; return false;
    }
    for (int64_t i = 0; i < ni; i++) {
        if (vertex_indices[i] < 0 || vertex_indices[i] >= vertex_count()) {
            snprintf(buf, sizeof buf, "vertex index %lld out of range",
                     (long long)i); *err = buf; return false;
        }
        if (attribute_indices[i] < 0 || attribute_indices[i] >= attribute_count()) {
            snprintf(buf, sizeof buf, "attribute index %lld out of range",
                     (long long)i); *err = buf; return false;
        }
    }
    for (int64_t t = 0; t < ni / 3; t++) {
        bool tex0 = attr_tex[attribute_indices[3 * t]] >= 0;
        for (int c = 1; c < 3; c++) {
            if ((attr_tex[attribute_indices[3 * t + c]] >= 0) != tex0) {
                snprintf(buf, sizeof buf,
                         "triangle %lld mixes color and texture attributes",
                         (long long)t);
                *err = buf; return false;
            }
        }
        if (tex0 && attr_tex[attribute_indices[3 * t]] >= texture_count()) {
            *err = "texture index out of range"; return false;
        }
    }
    return true;
}

namespace {

struct Reader {
    const uint8_t *p;
    size_t left;
    bool ok = true;

    bool read(void *dst, size_t n) {
        if (n > left) { ok = false; return false; }
        memcpy(dst, p, n);
        p += n;
        left -= n;
        return true;
    }
    int64_t header() {
        int64_t pair[2] = {-1, 0};
        read(pair, 16);
        return pair[0];
    }
};

constexpr int64_t kAttrRecord = 48;

}  // namespace

/* Parse body; counts are untrusted 64-bit values from the header, so every
 * section verifies count <= remaining/record_size BEFORE resizing (prevents
 * both multi-GB allocations from a tiny malformed file and size_t wrap in
 * count * record_size). */
static s3d_scene *scene_parse(const uint8_t *bytes, size_t len) {
    Reader r{bytes, len};
    auto scene = new s3d_scene();

    int64_t vcount = r.header();
    if (vcount < 0 || !r.ok || (uint64_t)vcount > r.left / 16) {
        s3d_set_error("truncated vertex header"); goto fail;
    }
    scene->vertices.resize((size_t)vcount * 4);
    if (!r.read(scene->vertices.data(), (size_t)vcount * 16)) {
        s3d_set_error("truncated vertex section"); goto fail;
    }

    {
        int64_t ni = r.header();
        int64_t aligned = ni + ni % 2;  /* payload padded to 16 B */
        if (ni < 0 || !r.ok || (uint64_t)aligned > r.left / 8) {
            s3d_set_error("truncated index header"); goto fail;
        }
        scene->vertex_indices.resize((size_t)aligned);
        if (!r.read(scene->vertex_indices.data(), (size_t)aligned * 8)) {
            s3d_set_error("truncated vertex index section"); goto fail;
        }
        scene->vertex_indices.resize((size_t)ni);
    }

    {
        int64_t ac = r.header();
        if (ac < 0 || !r.ok || (uint64_t)ac > r.left / kAttrRecord) {
            s3d_set_error("truncated attribute header"); goto fail;
        }
        scene->normals.resize((size_t)ac * 4);
        scene->attr_vec.resize((size_t)ac * 3);
        scene->attr_tex.resize((size_t)ac);
        for (int64_t i = 0; i < ac; i++) {
            uint8_t rec[kAttrRecord];
            if (!r.read(rec, kAttrRecord)) {
                s3d_set_error("truncated attribute record %lld", (long long)i);
                goto fail;
            }
            memcpy(&scene->normals[i * 4], rec, 16);
            if (rec[32] == 1) { /* texture */
                int64_t idx;
                memcpy(&idx, rec + 16, 8);
                float uv[2];
                memcpy(uv, rec + 24, 8);
                scene->attr_tex[i] = idx;
                scene->attr_vec[i * 3 + 0] = uv[0];
                scene->attr_vec[i * 3 + 1] = uv[1];
                scene->attr_vec[i * 3 + 2] = 0.f;
            } else { /* flat color */
                scene->attr_tex[i] = -1;
                memcpy(&scene->attr_vec[i * 3], rec + 16, 12);
            }
        }
    }

    {
        int64_t ni = r.header();
        int64_t aligned = ni + ni % 2;
        if (ni < 0 || !r.ok || (uint64_t)aligned > r.left / 8) {
            s3d_set_error("truncated attr index header"); goto fail;
        }
        scene->attribute_indices.resize((size_t)aligned);
        if (!r.read(scene->attribute_indices.data(), (size_t)aligned * 8)) {
            s3d_set_error("truncated attribute index section"); goto fail;
        }
        scene->attribute_indices.resize((size_t)ni);
    }

    {
        int64_t words = r.header();
        if (words < 0 || !r.ok || (uint64_t)words > r.left / 4) {
            s3d_set_error("truncated texture header"); goto fail;
        }
        scene->textures.resize((size_t)words);
        if (!r.read(scene->textures.data(), (size_t)words * 4)) {
            s3d_set_error("truncated texture section"); goto fail;
        }
    }

    {
        const char *err = nullptr;
        if (!scene->validate(&err)) {
            s3d_set_error("invalid scene: %s", err);
            goto fail;
        }
    }
    return scene;

fail:
    delete scene;
    return nullptr;
}

extern "C" s3d_scene *s3d_scene_from_memory(const uint8_t *bytes, size_t len) {
    /* No exception may escape the C ABI: a std::bad_alloc (or anything else)
     * from the parser becomes a clean s3d_set_error + nullptr. */
    try {
        return scene_parse(bytes, len);
    } catch (const std::exception &e) {
        s3d_set_error("scene parse failure: %s", e.what());
        return nullptr;
    }
}

extern "C" s3d_scene *s3d_scene_load(const char *path) {
    FILE *f = fopen(path, "rb");
    if (!f) { s3d_set_error("cannot open %s", path); return nullptr; }
    fseek(f, 0, SEEK_END);
    long len = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf((size_t)len);
    size_t got = fread(buf.data(), 1, (size_t)len, f);
    fclose(f);
    if (got != (size_t)len) { s3d_set_error("short read on %s", path); return nullptr; }
    return s3d_scene_from_memory(buf.data(), buf.size());
}

extern "C" s3d_scene *s3d_scene_create(
    const float *vertices4, int64_t vertex_count,
    const int64_t *vertex_indices, int64_t vertex_index_count,
    const float *normals4, const float *attr_vec, const int64_t *attr_tex,
    int64_t attribute_count,
    const int64_t *attribute_indices,
    const uint32_t *texture_words, int64_t texture_count) {
    auto scene = new s3d_scene();
    scene->vertices.assign(vertices4, vertices4 + vertex_count * 4);
    scene->vertex_indices.assign(vertex_indices,
                                 vertex_indices + vertex_index_count);
    scene->normals.assign(normals4, normals4 + attribute_count * 4);
    scene->attr_vec.assign(attr_vec, attr_vec + attribute_count * 3);
    scene->attr_tex.assign(attr_tex, attr_tex + attribute_count);
    scene->attribute_indices.assign(attribute_indices,
                                    attribute_indices + vertex_index_count);
    scene->textures.assign(texture_words,
                           texture_words + (texture_count << 18));
    const char *err = nullptr;
    if (!scene->validate(&err)) {
        s3d_set_error("invalid scene: %s", err);
        delete scene;
        return nullptr;
    }
    return scene;
}

extern "C" int s3d_scene_save(const s3d_scene *scene, const char *path) {
    FILE *f = fopen(path, "wb");
    if (!f) { s3d_set_error("cannot create %s", path); return -1; }
    auto header = [&](int64_t count) {
        int64_t pair[2] = {count, 0};
        fwrite(pair, 1, 16, f);
    };
    header(scene->vertex_count());
    fwrite(scene->vertices.data(), 4, scene->vertices.size(), f);

    int64_t ni = (int64_t)scene->vertex_indices.size();
    header(ni);
    fwrite(scene->vertex_indices.data(), 8, (size_t)ni, f);
    if (ni % 2) { int64_t z = 0; fwrite(&z, 8, 1, f); }

    int64_t ac = scene->attribute_count();
    header(ac);
    for (int64_t i = 0; i < ac; i++) {
        uint8_t rec[48] = {0};
        memcpy(rec, &scene->normals[i * 4], 16);
        if (scene->attr_tex[i] >= 0) {
            memcpy(rec + 16, &scene->attr_tex[i], 8);
            memcpy(rec + 24, &scene->attr_vec[i * 3], 8);
            rec[32] = 1;
        } else {
            memcpy(rec + 16, &scene->attr_vec[i * 3], 12);
        }
        fwrite(rec, 1, 48, f);
    }

    header(ni);
    fwrite(scene->attribute_indices.data(), 8, (size_t)ni, f);
    if (ni % 2) { int64_t z = 0; fwrite(&z, 8, 1, f); }

    header((int64_t)scene->textures.size());
    fwrite(scene->textures.data(), 4, scene->textures.size(), f);
    fclose(f);
    return 0;
}

extern "C" void s3d_scene_free(s3d_scene *scene) { delete scene; }
extern "C" int64_t s3d_scene_vertex_count(const s3d_scene *s) { return s->vertex_count(); }
extern "C" int64_t s3d_scene_triangle_count(const s3d_scene *s) { return s->triangle_count(); }
extern "C" int64_t s3d_scene_texture_count(const s3d_scene *s) { return s->texture_count(); }
