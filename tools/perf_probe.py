"""Per-stage kernel cost instrumentation on the real chip.

Measures, with the bench.py chained-scan protocol (N frames in one lax.scan,
per-frame checksums, empty-chain subtraction), the cost of:

  frontend  geometry front-end + binning + table packing (XLA, no kernel)
  grid      the kernel over an all-dead setup table (pure per-grid-step cost)
  full      the full pallas frame

at the requested configs. Use to attribute frame time before/after kernel
changes (docs/KERNEL.md "performance anatomy").
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def setup_cache():
    import os

    import jax
    cache = os.path.expanduser("~/.cache/s3d_jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def probe(scene_name: str, width: int, height: int, frames: int, tile_h: int,
          objects: int = 0):
    import jax
    import jax.numpy as jnp

    from swift3drenderer_tpu.camera import Camera, Input
    from swift3drenderer_tpu.config import DEFAULT_CONFIG
    from swift3drenderer_tpu.models import SCENES
    from swift3drenderer_tpu.ops.raster_pallas import (
        bin_segments, bin_triangles, pack_setup_tables, rasterize_pallas)
    from swift3drenderer_tpu.renderer import build_setup, scene_to_device

    kwargs = {"objects": objects} if objects else {}
    scene = SCENES[scene_name](seed=0, **kwargs)
    dev = scene_to_device(scene)
    cam = Camera()
    mats = np.stack([
        cam.update(Input(up=1.0, mouse=(2.0 * i, 0.0)), force_update=(i == 0)).copy()
        for i in range(frames)
    ])
    mats = jnp.asarray(mats, jnp.float32)

    def chain(body):
        @jax.jit
        def run(dev, mats):
            def step(carry, m):
                return carry, body(dev, m)
            _, sums = jax.lax.scan(step, 0, mats)
            return sums
        return run

    def frontend_body(dev, m):
        # Mirror _rasterize_chunk's binner choice: small scenes bin flat
        # (SMEM-resident table), larger ones use the segmented front-end.
        setup = build_setup(dev, m, width=width, height=height,
                            config=DEFAULT_CONFIG)
        s = setup["live"].shape[0]
        ntiles = ((width + 127) // 128) * ((height + tile_h - 1) // tile_h)
        if s + 3 <= 128 and ntiles <= 512:
            ids, counts = bin_triangles(setup, width=width, height=height,
                                        tile_h=tile_h, tile_w=128)
            extra = 0.0
        else:
            ids, counts, ncol, starts, bb, bb_cnt, bb_ncol = bin_segments(
                setup, width=width, height=height, tile_h=tile_h, tile_w=128)
            extra = (starts[::5].sum() + bb[::7, ::13].sum() + ncol[::3].sum()
                     + bb_cnt + bb_ncol).astype(jnp.float32)
        trf, tri = pack_setup_tables(setup)
        return (ids[::7, ::13].sum() + counts.sum() + trf[::5, ::11].sum()
                + tri[::3, ::17].sum().astype(jnp.float32) + extra)

    def phase_body(phases):
        def body(dev, m):
            setup = build_setup(dev, m, width=width, height=height,
                                config=DEFAULT_CONFIG)
            px, ooz = rasterize_pallas(
                setup, dev["textures"], width=width, height=height,
                background=DEFAULT_CONFIG.background_packed, tile_h=tile_h,
                phases=phases)
            return px[::64, ::64].astype(jnp.uint32).sum()
        return body

    full_body = phase_body("full")

    def grid_body(dev, m):
        setup = build_setup(dev, m, width=width, height=height,
                            config=DEFAULT_CONFIG)
        setup = dict(setup)
        setup["live"] = jnp.zeros_like(setup["live"])
        px, ooz = rasterize_pallas(
            setup, dev["textures"], width=width, height=height,
            background=DEFAULT_CONFIG.background_packed, tile_h=tile_h)
        return px[::64, ::64].astype(jnp.uint32).sum()

    def empty_body(dev, m):
        return m.sum()

    def timed(run):
        s = run(dev, mats)
        float(np.asarray(s).sum())  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = run(dev, mats)
            float(np.asarray(s).sum())
            best = min(best, (time.perf_counter() - t0) / frames)
        return best

    overhead = timed(chain(empty_body))
    out = {}
    for name, body in [("frontend", frontend_body), ("grid", grid_body),
                       ("vis", phase_body("vis")), ("shade", phase_body("shade")),
                       ("full", full_body)]:
        out[name] = max(timed(chain(body)) - overhead, 0.0) * 1e3
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="default")
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--tile-h", type=int, default=64)
    p.add_argument("--configs", default="1920x1080,3840x2160")
    p.add_argument("--objects", type=int, default=0,
                   help="object count for --scene stress (0 = scene default)")
    args = p.parse_args()
    setup_cache()
    for wh in args.configs.split(","):
        w, h = map(int, wh.split("x"))
        r = probe(args.scene, w, h, args.frames, args.tile_h,
                  objects=args.objects)
        print(f"{args.scene} {w}x{h} tile_h={args.tile_h}: "
              f"frontend {r['frontend']:.3f} | grid {r['grid']:.3f} | "
              f"vis {r['vis']:.3f} | +shade {r['shade']:.3f} | "
              f"full {r['full']:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
