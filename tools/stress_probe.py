"""Phase anatomy of the SHIPPED large-scene path (compact-early multipass).

tools/perf_probe.py attributes the full-table `rasterize_pallas` pipeline;
the shipped stress path is `_rasterize_corners_compacted` (prelive cull +
per-chunk clip/setup + live-compacted passes), so this probe times THAT
pipeline with the kernel stopped after each phase:

  vis    front-end + binning + visibility
  shade  + shading (no texel fetch)
  full   the shipped frame

Chained-scan protocol as bench.py (N frames, checksums, empty-chain
subtraction). Run: python tools/stress_probe.py [--objects 840] [--w 1920]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/s3d_jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from swift3drenderer_tpu.camera import Camera, Input
    from swift3drenderer_tpu.config import DEFAULT_CONFIG
    from swift3drenderer_tpu.models import SCENES
    import swift3drenderer_tpu.ops.raster_pallas as rp
    from swift3drenderer_tpu.renderer import build_corners, scene_to_device

    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="stress")
    p.add_argument("--objects", type=int, default=840)
    p.add_argument("--w", type=int, default=1920)
    p.add_argument("--h", type=int, default=1080)
    p.add_argument("--frames", type=int, default=20)
    args = p.parse_args()

    kwargs = {"objects": args.objects} if args.scene == "stress" else {}
    scene = SCENES[args.scene](seed=0, **kwargs)
    dev = scene_to_device(scene)
    cfg = DEFAULT_CONFIG
    W, H = args.w, args.h
    tile_h = rp._pick_tile_h(dev, H, rp.MAX_SLOTS_PER_PASS_B1)
    print(f"{scene.num_triangles} tris, {W}x{H}, tile_h={tile_h}", flush=True)

    cam = Camera()
    mats = np.stack([
        cam.update(Input(up=1.0, mouse=(2.0 * i, 0.0)),
                   force_update=(i == 0)).copy()
        for i in range(args.frames)
    ])
    mats = jnp.asarray(mats, jnp.float32)

    def phase_body(phases):
        def body(dev, m):
            corners = jax.tree.map(
                lambda a: a[None],
                build_corners(dev, m, width=W, height=H, config=cfg))
            pix, ooz = rp._rasterize_corners_compacted(
                corners, dev["textures"],
                near=cfg.near, factor=cfg.factor(H),
                half_w=W / 2.0, half_h=H / 2.0,
                min_area=cfg.min_area, cap=rp.MAX_SLOTS_PER_PASS_B1,
                width=W, height=H, background=cfg.background_packed,
                tile_h=tile_h, tile_w=128, y_offset=0, interpret=False,
                sampling=cfg.sampling, strip_h=rp._pick_strip_h(H),
                phases=phases)
            return pix[0, ::64, ::64].astype(jnp.uint32).sum()
        return body

    def frontend_body(dev, m):
        # Front-end only: corners + prelive + compaction permutation + the
        # first chunk's clip/setup (no binning, no kernel).
        corners = jax.tree.map(
            lambda a: a[None],
            build_corners(dev, m, width=W, height=H, config=cfg))
        live = jax.vmap(functools.partial(
            rp._triangle_prelive, width=W, height=H, near=cfg.near,
            min_area=cfg.min_area))(corners)
        t = live.shape[1]
        idx = jnp.arange(t, dtype=jnp.int32)[None, :]
        perm = jnp.sort(jnp.where(live, idx, idx + t), axis=-1) % t
        return perm[:, ::97].sum() + live.sum()

    def empty_body(dev, m):
        return m.sum()

    def chain(body):
        @jax.jit
        def run(dev, mats):
            def step(carry, m):
                return carry, body(dev, m)
            _, sums = jax.lax.scan(step, 0, mats)
            return sums
        return run

    def timed(run):
        s = run(dev, mats)
        float(np.asarray(s).sum())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = run(dev, mats)
            float(np.asarray(s).sum())
            best = min(best, (time.perf_counter() - t0) / args.frames)
        return best

    overhead = timed(chain(empty_body))
    for name, body in [("prelive", frontend_body),
                       ("vis", phase_body("vis")),
                       ("shade", phase_body("shade")),
                       ("full", phase_body("full"))]:
        ms = max(timed(chain(body)) - overhead, 0.0) * 1e3
        print(f"{name:8s} {ms:7.3f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
