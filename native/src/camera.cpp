/* Camera state machine — native twin of swift3drenderer_tpu/camera.py
 * (reference updateCamera, render/render.swift:113-135). */

#include <cmath>
#include <cstring>
#include <ctime>

#include "internal.h"

namespace {

Vec3 normalize3(Vec3 v) {
    float n = sqrtf(dot3(v, v));
    return {v.x / n, v.y / n, v.z / n};
}

struct Quat {
    float x, y, z, w;
};

/* Shortest-arc quaternion rotating unit vector a onto b. */
Quat quat_from_to(Vec3 a, Vec3 b) {
    Vec3 c = cross3(a, b);
    float w = 1.0f + dot3(a, b);
    float n = sqrtf(c.x * c.x + c.y * c.y + c.z * c.z + w * w);
    if (n == 0.f) return {1.f, 0.f, 0.f, 0.f};
    return {c.x / n, c.y / n, c.z / n, w / n};
}

Vec3 quat_rotate(Quat q, Vec3 v) {
    Vec3 qv = {q.x, q.y, q.z};
    Vec3 t = cross3(qv, v) * 2.0f;
    return v + t * q.w + cross3(qv, t);
}

}  // namespace

extern "C" void s3d_config_default(s3d_config *config) {
    config->near_plane = 0.1f;
    config->fov = (float)(M_PI / 5.0);
    config->speed = 0.1f;
    config->rotation_speed = 0.3f;
    config->min_area = 10.0f;
    config->background = 0x001E1E1Eu;
    config->bilinear = 0;
}

extern "C" void s3d_camera_init(s3d_camera *cam) {
    memset(cam, 0, sizeof(*cam));
    cam->axis_x[0] = cam->axis_y[1] = cam->axis_z[2] = 1.0f;
    cam->matrix[0] = cam->matrix[5] = cam->matrix[10] = 1.0f;
}

extern "C" void s3d_camera_update(s3d_camera *cam, const s3d_input *input,
                                  const s3d_config *config, int force_update) {
    Vec3 pos = {cam->position[0], cam->position[1], cam->position[2]};
    Vec3 ax = {cam->axis_x[0], cam->axis_x[1], cam->axis_x[2]};
    Vec3 ay = {cam->axis_y[0], cam->axis_y[1], cam->axis_y[2]};
    Vec3 az = {cam->axis_z[0], cam->axis_z[1], cam->axis_z[2]};
    bool changed = false;

    if (input->left > 0 || input->right > 0 || input->up > 0 || input->down > 0) {
        changed = true;
        pos = pos + config->speed * ((input->right - input->left) * ax +
                                     (input->down - input->up) * az);
    }
    if (input->mouse_x != cam->mouse[0] || input->mouse_y != cam->mouse[1]) {
        changed = true;
        Vec3 z = normalize3((cam->mouse[0] - input->mouse_x) * ax +
                            (cam->mouse[1] - input->mouse_y) * ay +
                            (100.0f / config->rotation_speed) * az);
        Quat q = quat_from_to(az, z);
        ax = normalize3(quat_rotate(q, ax));
        ay = normalize3(quat_rotate(q, ay));
        az = z;
        cam->mouse[0] = input->mouse_x;
        cam->mouse[1] = input->mouse_y;
    }
    memcpy(cam->position, &pos, 12);
    memcpy(cam->axis_x, &ax, 12);
    memcpy(cam->axis_y, &ay, 12);
    memcpy(cam->axis_z, &az, 12);
    if (changed || force_update) {
        const Vec3 rows[3] = {ax, ay, az};
        for (int r = 0; r < 3; r++) {
            cam->matrix[r * 4 + 0] = rows[r].x;
            cam->matrix[r * 4 + 1] = rows[r].y;
            cam->matrix[r * 4 + 2] = rows[r].z;
            cam->matrix[r * 4 + 3] = -dot3(rows[r], pos);
        }
    }
}

extern "C" double s3d_now(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}
