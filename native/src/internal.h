/* Internal structures of the native runtime. */
#ifndef S3D_INTERNAL_H
#define S3D_INTERNAL_H

#include <cstdint>
#include <functional>
#include <vector>

#include "../include/s3d_native.h"

struct Vec3 {
    float x = 0, y = 0, z = 0;
};

static inline Vec3 v3(float x, float y, float z) { return {x, y, z}; }
static inline Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline Vec3 operator-(Vec3 a) { return {-a.x, -a.y, -a.z}; }
static inline Vec3 operator*(Vec3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline Vec3 operator*(float s, Vec3 a) { return a * s; }
static inline float dot3(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline Vec3 cross3(Vec3 a, Vec3 b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}

/* Structure-of-arrays scene, mirroring swift3drenderer_tpu.utils.databin.Scene. */
struct s3d_scene {
    std::vector<float> vertices;        /* V*4 */
    std::vector<int64_t> vertex_indices;
    std::vector<float> normals;         /* A*4 */
    std::vector<float> attr_vec;        /* A*3: RGB or (u, v, 0) */
    std::vector<int64_t> attr_tex;      /* A: texture index or -1 */
    std::vector<int64_t> attribute_indices;
    std::vector<uint32_t> textures;     /* NT * 512 * 512 words */

    int64_t vertex_count() const { return (int64_t)vertices.size() / 4; }
    int64_t attribute_count() const { return (int64_t)normals.size() / 4; }
    int64_t triangle_count() const { return (int64_t)vertex_indices.size() / 3; }
    int64_t texture_count() const { return (int64_t)textures.size() >> 18; }
    bool validate(const char **err) const;
};

void s3d_set_error(const char *fmt, ...);

#endif
