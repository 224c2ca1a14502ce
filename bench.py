"""Benchmark entry point — prints ONE JSON line with the headline metric.

Headline: frames/sec at 1920x1080 on the full mixed scene (BASELINE.json metric),
single chip. ``vs_baseline`` is the speedup over the measured reference C++ -O2 CPU
renderer at the same config (see BASELINE.md; measured by tools/cpu_baseline).

Timing protocol: the frame is rendered on device and completion is forced through a
dependent scalar fetch; on tunneled TPU attachments plain block_until_ready returns
before execution completes, and full-frame readback measures the tunnel, not the
renderer. The scalar roundtrip latency is measured separately and subtracted.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure(scene_name: str, width: int, height: int, frames: int,
            backend: str) -> dict:
    import jax
    import jax.numpy as jnp

    from swift3drenderer_tpu.camera import Camera, Input
    from swift3drenderer_tpu.models import SCENES
    from swift3drenderer_tpu.renderer import Renderer

    scene = SCENES[scene_name](seed=0)
    renderer = Renderer(scene, backend=backend)
    m = jnp.asarray(Camera().update(Input(), force_update=True), jnp.float32)

    def frame_checksum():
        px, depth = renderer.render_device(m, width, height)
        return float(px.reshape(-1)[:: max(1, px.size // 64)].sum())  # forces completion

    # Scalar roundtrip latency (tunnel overhead, not renderer time).
    one = jnp.float32(1.0)
    add = jax.jit(lambda a: a + 1)
    float(add(one))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        float(add(one))
    latency = (time.perf_counter() - t0) / reps

    frame_checksum()  # compile + warm up
    times = []
    for _ in range(frames):
        t0 = time.perf_counter()
        frame_checksum()
        times.append(time.perf_counter() - t0)
    frame_s = max(float(np.median(times)) - latency, 1e-9)
    return dict(frame_ms=frame_s * 1e3, fps=1.0 / frame_s,
                latency_ms=latency * 1e3,
                tris=scene.num_triangles, pixels=width * height)


# Measured reference C++ -O2 renderer (headless harness, this machine's CPU) at
# 1920x1080 full scene — see BASELINE.md and tools/cpu_baseline/results.json.
CPU_BASELINE_FPS = 25.08


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="default")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--backend", default="xla")
    p.add_argument("--all-configs", action="store_true",
                   help="print a table over the BASELINE configs instead")
    args = p.parse_args()

    if args.all_configs:
        for name, w, h in [("tetrahedron", 640, 480), ("icosahedron", 1920, 1080),
                           ("anisotropic", 1920, 1080), ("clipping", 1920, 1080),
                           ("default", 3840, 2160)]:
            r = measure(name, w, h, args.frames, args.backend)
            print(f"{name:14s} {w}x{h}: {r['frame_ms']:8.2f} ms  "
                  f"{r['fps']:8.1f} fps  ({r['tris']} tris)")
        return

    r = measure(args.scene, args.width, args.height, args.frames, args.backend)
    mpix = r["pixels"] * r["fps"] / 1e6
    vs = (r["fps"] / CPU_BASELINE_FPS) if CPU_BASELINE_FPS else None
    print(json.dumps({
        "metric": f"fps@{args.width}x{args.height} {args.scene} scene ({args.backend})",
        "value": round(r["fps"], 2),
        "unit": "frames/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "extra": {"frame_ms": round(r["frame_ms"], 3),
                  "tunnel_latency_ms": round(r["latency_ms"], 2),
                  "Mpix_per_s": round(mpix, 1),
                  "triangles": r["tris"]},
    }))


if __name__ == "__main__":
    main()
