/* Linux shim for Apple's <simd/simd.h> — just enough surface for building the
 * reference renderer core (/root/reference/render-cpp/render.cpp) as a headless
 * CPU baseline harness (BASELINE.md). Plain structs with inline operators; g++
 * vectorizes these fine at -O2, matching the reference's "readable simd calls,
 * no intrinsics" spirit (reference README.md:31).
 */
#ifndef LINUX_SIMD_SHIM_H
#define LINUX_SIMD_SHIM_H

/* Apple's simd.h transitively provides much of libc; the reference core relies
 * on that, so pull the same pieces in here. */
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

/* alignas(8) matters: texture_t{uint32_t index; simd_float2 uv} must place uv at
 * offset 8 to match the on-disk attribute record layout. */
struct alignas(8) simd_float2 {
    float x, y;
    float &operator[](int i) { return (&x)[i]; }
    const float &operator[](int i) const { return (&x)[i]; }
};

struct alignas(16) simd_float3 {
    float x, y, z, _pad;
    float &operator[](int i) { return (&x)[i]; }
    const float &operator[](int i) const { return (&x)[i]; }
};

struct alignas(16) simd_float4 {
    float x, y, z, w;
    float &operator[](int i) { return (&x)[i]; }
    const float &operator[](int i) const { return (&x)[i]; }
};

/* rows-of-float4 4x3 matrix (3 rows, 4 columns), like simd_float4x3 */
struct simd_float4x3 {
    simd_float4 rows[3];
};

struct simd_quatf {
    float ix, iy, iz, r;
};

static inline simd_float2 simd_make_float2(float x, float y) { return {x, y}; }
static inline simd_float3 simd_make_float3(float x, float y, float z) {
    return {x, y, z, 0.f};
}
static inline simd_float3 simd_make_float3(simd_float2 v, float z) {
    return {v.x, v.y, z, 0.f};
}
static inline simd_float4 simd_make_float4(float x, float y, float z, float w) {
    return {x, y, z, w};
}
static inline simd_float4 simd_make_float4(simd_float3 v, float w) {
    return {v.x, v.y, v.z, w};
}

/* ---- float2 ops ---- */
static inline simd_float2 operator+(simd_float2 a, simd_float2 b) { return {a.x + b.x, a.y + b.y}; }
static inline simd_float2 operator-(simd_float2 a, simd_float2 b) { return {a.x - b.x, a.y - b.y}; }
static inline simd_float2 operator*(simd_float2 a, simd_float2 b) { return {a.x * b.x, a.y * b.y}; }
static inline simd_float2 operator*(simd_float2 a, float s) { return {a.x * s, a.y * s}; }
static inline simd_float2 operator*(float s, simd_float2 a) { return {a.x * s, a.y * s}; }
static inline simd_float2 operator/(simd_float2 a, float s) { return {a.x / s, a.y / s}; }
static inline simd_float2 operator/(float s, simd_float2 a) { return {s / a.x, s / a.y}; }
static inline simd_float2 operator/(simd_float2 a, simd_float2 b) { return {a.x / b.x, a.y / b.y}; }
static inline simd_float2 &operator+=(simd_float2 &a, simd_float2 b) { a = a + b; return a; }

/* ---- float3 ops ---- */
static inline simd_float3 operator+(simd_float3 a, simd_float3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z, 0.f}; }
static inline simd_float3 operator-(simd_float3 a, simd_float3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z, 0.f}; }
static inline simd_float3 operator-(simd_float3 a) { return {-a.x, -a.y, -a.z, 0.f}; }
static inline simd_float3 operator*(simd_float3 a, simd_float3 b) { return {a.x * b.x, a.y * b.y, a.z * b.z, 0.f}; }
static inline simd_float3 operator*(simd_float3 a, float s) { return {a.x * s, a.y * s, a.z * s, 0.f}; }
static inline simd_float3 operator*(float s, simd_float3 a) { return a * s; }
static inline simd_float3 operator/(simd_float3 a, float s) { return {a.x / s, a.y / s, a.z / s, 0.f}; }
static inline simd_float3 operator/(float s, simd_float3 a) { return {s / a.x, s / a.y, s / a.z, 0.f}; }
static inline simd_float3 &operator+=(simd_float3 &a, simd_float3 b) { a = a + b; return a; }

/* ---- float4 ops ---- */
static inline simd_float4 operator*(simd_float4 a, float s) { return {a.x * s, a.y * s, a.z * s, a.w * s}; }
static inline simd_float4 operator*(float s, simd_float4 a) { return a * s; }
static inline simd_float4 operator+(simd_float4 a, simd_float4 b) { return {a.x + b.x, a.y + b.y, a.z + b.z, a.w + b.w}; }

static inline float simd_dot(simd_float2 a, simd_float2 b) { return a.x * b.x + a.y * b.y; }
static inline float simd_dot(simd_float3 a, simd_float3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline float simd_dot(simd_float4 a, simd_float4 b) { return a.x * b.x + a.y * b.y + a.z * b.z + a.w * b.w; }

static inline simd_float3 simd_cross(simd_float3 a, simd_float3 b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x, 0.f};
}

static inline simd_float2 simd_abs(simd_float2 a) { return {fabsf(a.x), fabsf(a.y)}; }
static inline simd_float3 simd_abs(simd_float3 a) { return {fabsf(a.x), fabsf(a.y), fabsf(a.z), 0.f}; }
static inline simd_float2 simd_min(simd_float2 a, simd_float2 b) { return {fminf(a.x, b.x), fminf(a.y, b.y)}; }
static inline simd_float2 simd_max(simd_float2 a, simd_float2 b) { return {fmaxf(a.x, b.x), fmaxf(a.y, b.y)}; }
static inline simd_float3 simd_min(simd_float3 a, simd_float3 b) { return {fminf(a.x, b.x), fminf(a.y, b.y), fminf(a.z, b.z), 0.f}; }
static inline simd_float3 simd_max(simd_float3 a, simd_float3 b) { return {fmaxf(a.x, b.x), fmaxf(a.y, b.y), fmaxf(a.z, b.z), 0.f}; }

static inline simd_float3 simd_fast_normalize(simd_float3 a) {
    float inv = 1.0f / sqrtf(simd_dot(a, a));
    return a * inv;
}

/* Shortest-arc quaternion from unit vector `from` to unit vector `to`. */
static inline simd_quatf simd_quaternion(simd_float3 from, simd_float3 to) {
    simd_float3 c = simd_cross(from, to);
    float w = 1.0f + simd_dot(from, to);
    float n = sqrtf(c.x * c.x + c.y * c.y + c.z * c.z + w * w);
    if (n == 0.f) return {1.f, 0.f, 0.f, 0.f};
    float inv = 1.0f / n;
    return {c.x * inv, c.y * inv, c.z * inv, w * inv};
}

static inline simd_float3 simd_act(simd_quatf q, simd_float3 v) {
    simd_float3 qv = {q.ix, q.iy, q.iz, 0.f};
    simd_float3 t = simd_cross(qv, v) * 2.0f;
    return v + t * q.r + simd_cross(qv, t);
}

static inline simd_float4x3 simd_matrix_from_rows(simd_float4 r0, simd_float4 r1,
                                                  simd_float4 r2) {
    simd_float4x3 m; m.rows[0] = r0; m.rows[1] = r1; m.rows[2] = r2; return m;
}

static inline simd_float3 simd_mul(simd_float4x3 m, simd_float4 v) {
    return {simd_dot(m.rows[0], v), simd_dot(m.rows[1], v), simd_dot(m.rows[2], v),
            0.f};
}

/* macOS libc extras used by the renderer */
#include <cstring>
static inline void memset_pattern4(void *dst, const void *pattern, size_t len) {
    uint32_t p;
    memcpy(&p, pattern, 4);
    uint32_t *d = (uint32_t *)dst;
    for (size_t i = 0; i < len / 4; i++) d[i] = p;
}

#include <limits.h>
#ifndef PATH_MAX
#define PATH_MAX 4096
#endif

#endif /* LINUX_SIMD_SHIM_H */
