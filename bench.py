"""Benchmark entry point — prints ONE JSON line with the headline metric.

Headline: frames/sec at 1920x1080 on the full mixed scene (BASELINE.json metric),
single chip. ``vs_baseline`` is the speedup over the measured reference C++ -O2 CPU
renderer at the same config (see BASELINE.md; measured by tools/cpu_baseline).

Timing protocol: K frames are rendered back-to-back on device inside one
``lax.scan`` (distinct camera poses per frame, per-frame checksums so no frame can
be elided), synced once at the end — steady-state throughput with host/tunnel
latency amortized away. On tunneled TPU attachments, per-frame host syncs would
measure the tunnel (~30 ms roundtrip), not the renderer.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def measure(scene_name: str, width: int, height: int, frames: int,
            backend: str, batch: int = 1, tile_h: int | None = None,
            objects: int | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    # Persist compiled executables across bench runs (first compile of a chained
    # frame scan through a remote-compile attachment takes minutes).
    import os
    cache = os.path.expanduser("~/.cache/s3d_jax_cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from swift3drenderer_tpu.camera import Camera, Input
    from swift3drenderer_tpu.config import DEFAULT_CONFIG
    from swift3drenderer_tpu.models import SCENES
    from swift3drenderer_tpu.renderer import render_frame_xla, scene_to_device

    scene = SCENES[scene_name](seed=0, **({"objects": objects} if objects
                                          else {}))
    dev = scene_to_device(scene)
    cam = Camera()
    mats = np.stack([
        cam.update(Input(up=1.0, mouse=(2.0 * i, 0.0)), force_update=(i == 0)).copy()
        for i in range(frames * batch)
    ])
    if batch > 1:
        # Serving mode: each scan step renders a B-camera batch in ONE kernel
        # dispatch (the batch axis rides the kernel grid).
        mats = mats.reshape(frames, batch, 3, 4)
    mats = jnp.asarray(mats, jnp.float32)

    interpret = jax.default_backend() not in ("tpu", "axon")
    if backend == "pallas" and batch > 1:
        from swift3drenderer_tpu.ops.raster_pallas import render_batch_pallas
        render = functools.partial(render_batch_pallas, interpret=interpret)
    elif backend == "pallas":
        from swift3drenderer_tpu.ops.raster_pallas import render_frame_pallas
        render = functools.partial(render_frame_pallas, interpret=interpret,
                                   tile_h=tile_h)
    else:
        assert batch == 1, "--batch needs the pallas backend"
        render = render_frame_xla

    @functools.partial(jax.jit, static_argnames=("width", "height"))
    def render_chain(dev, mats, width, height):
        def body(carry, m):
            px, depth = render(dev, m, width=width, height=height,
                               config=DEFAULT_CONFIG)
            return carry, px.reshape(-1)[::4099].astype(jnp.uint32).sum()
        _, sums = jax.lax.scan(body, 0, mats)
        return sums

    @jax.jit
    def empty_chain(mats):
        def body(carry, m):
            return carry, m.sum()
        _, sums = jax.lax.scan(body, 0, mats)
        return sums

    def timed_once(fn, *args):
        t0 = time.perf_counter()
        s = fn(*args)
        float(np.asarray(s).sum())
        return (time.perf_counter() - t0) / frames

    # Subtract the fixed dispatch/roundtrip cost of an identical empty chain so
    # the figure is pure render time (on tunneled attachments the roundtrip is
    # ~30 ms and would otherwise smear ~30/frames ms into every frame). Empty
    # and render reps are interleaved so both sample the same tunnel-latency
    # phase; the estimator below then combines them robustly. Tiny workloads
    # can disappear below the dispatch noise floor; floor the figure there
    # instead of reporting fantasy fps.
    float(np.asarray(empty_chain(mats)).sum())  # compile + warm up
    float(np.asarray(render_chain(dev, mats, width, height)).sum())
    raws, ovhs = [], []
    for _ in range(5):
        ovhs.append(timed_once(empty_chain, mats))
        raws.append(timed_once(render_chain, dev, mats, width, height))
    # Tunnel noise is ADDITIVE on the render chain (latency only inflates), so
    # min(raws) estimates true device time; the empty-chain overhead, however,
    # occasionally spikes, and subtracting a per-round or min overhead lets one
    # spike fabricate a too-fast frame (observed: a 13 ms workload reading
    # 7.95 once). min(raw) - median(overhead) is robust on both sides.
    best = (min(raws) - sorted(ovhs)[len(ovhs) // 2]) / batch  # per FRAME
    floor_s = 50e-6
    return dict(frame_ms=max(best, floor_s) * 1e3,
                fps=1.0 / max(best, floor_s),
                overhead_bound=best < floor_s,
                tris=scene.num_triangles, pixels=width * height)


# Measured reference C++ -O2 renderer (headless harness, this machine's CPU) at
# 1920x1080 full scene — see BASELINE.md and tools/cpu_baseline/results.json.
CPU_BASELINE_FPS = 25.08


def _require_backend(timeout_s: float) -> None:
    """Fail fast (instead of hanging forever) when the TPU tunnel is dead.

    This environment registers the 'axon' PJRT backend at interpreter start;
    when its network tunnel is down, the FIRST backend touch blocks
    indefinitely — observed as multi-hour hangs even for `jnp.ones(4)`. A
    bench run that hangs produces no record at all; a clean diagnostic and a
    nonzero exit is strictly more useful to whatever invoked us. The probe
    runs in a daemon thread so a hung init can't keep the process alive.

    The tunnel's OTHER failure mode is a fast "Unable to initialize backend
    'axon': UNAVAILABLE" error, and that one is frequently transient (the
    tunnel flaps). A failed backend init is sticky within a JAX process, so
    on a fast error we sleep and re-exec this process (fresh interpreter →
    fresh init attempt) until the shared deadline — carried across execs in
    S3D_BENCH_INIT_DEADLINE — is exhausted.
    """
    import os
    import sys
    import threading

    deadline_env = os.environ.get("S3D_BENCH_INIT_DEADLINE")
    deadline = float(deadline_env) if deadline_env else time.time() + timeout_s
    os.environ["S3D_BENCH_INIT_DEADLINE"] = repr(deadline)

    done = threading.Event()
    info = {}

    def probe():
        try:
            import jax
            info["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — report, then fail fast below
            info["error"] = e
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(max(deadline - time.time(), 1.0)):
        print(f"bench: backend initialization did not complete within "
              f"{timeout_s:.0f}s — TPU tunnel down? (set "
              f"S3D_BENCH_INIT_TIMEOUT to adjust)", file=sys.stderr)
        os._exit(3)
    if "error" in info:
        retry_wait = float(os.environ.get("S3D_BENCH_INIT_RETRY_WAIT", "30"))
        if time.time() + retry_wait < deadline:
            print(f"bench: backend initialization failed ({info['error']}); "
                  f"retrying in {retry_wait:.0f}s "
                  f"({deadline - time.time():.0f}s of budget left)",
                  file=sys.stderr)
            time.sleep(retry_wait)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        print(f"bench: backend initialization failed: {info['error']}",
              file=sys.stderr)
        os._exit(3)


def main() -> None:
    import os
    # 1200s default: a healthy-but-cold tunnel has been observed to take tens
    # of minutes on first contact; only a genuinely dead one exceeds this.
    _require_backend(float(os.environ.get("S3D_BENCH_INIT_TIMEOUT", "1200")))
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="default")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    # 20 frames is the documented measurement protocol (BASELINE.md): long
    # enough that the fixed tunnel/dispatch amortization subtracts cleanly.
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--backend", default="pallas")
    p.add_argument("--batch", type=int, default=1,
                   help="serving mode: cameras per kernel dispatch (pallas)")
    p.add_argument("--tile-h", type=int, default=None,
                   help="override the kernel tile height (A/B probes; "
                        "default: adaptive per resolution)")
    p.add_argument("--objects", type=int, default=None,
                   help="object count for --scene stress (840 = the 10,083-"
                        "triangle large-scene config in BASELINE.md)")
    p.add_argument("--all-configs", action="store_true",
                   help="print a table over the BASELINE configs instead")
    p.add_argument("--out", default="bench_all_configs.json",
                   help="JSON artifact path for --all-configs results")
    args = p.parse_args()

    if args.all_configs:
        rows = []
        # The five BASELINE configs plus the two scale rows (stress 10k and
        # stress100k) — Mtri/s only carries signal on the stress families
        # (the BASELINE scenes have <60 triangles).
        for name, w, h, objects in [
                ("tetrahedron", 640, 480, None),
                ("icosahedron", 1920, 1080, None),
                ("anisotropic", 1920, 1080, None),
                ("clipping", 1920, 1080, None),
                ("default", 3840, 2160, None),
                ("stress", 1920, 1080, 840),
                ("stress100k", 1920, 1080, None)]:
            r = measure(name, w, h, args.frames, args.backend,
                        objects=objects)
            batch = 1
            if r.get("overhead_bound") and args.backend == "pallas":
                # Tiny frames sit below the single-dispatch noise floor; the
                # SERVING path (8 cameras per kernel dispatch) amortizes the
                # dispatch and gives the config a real measured figure
                # (BASELINE.md serving table) instead of "overhead-bound".
                batch = 8
                r = measure(name, w, h, args.frames, args.backend, batch=8)
            rows.append({
                "config": name, "width": w, "height": h, "batch": batch,
                "frame_ms": round(r["frame_ms"], 3),
                "fps": round(r["fps"], 1),
                "Mpix_per_s": round(r["pixels"] * r["fps"] / 1e6, 1),
                "Mtri_per_s": round(r["tris"] * r["fps"] / 1e6, 3),
                "triangles": r["tris"],
                "overhead_bound": bool(r.get("overhead_bound", False)),
            })
            note = "  (serving B=8)" if batch > 1 else ""
            note += "  (overhead-bound)" if r.get("overhead_bound") else ""
            print(f"{name:14s} {w}x{h}: {r['frame_ms']:8.2f} ms  "
                  f"{r['fps']:8.1f} fps  ({r['tris']} tris){note}")
        with open(args.out, "w") as f:
            json.dump({"backend": args.backend, "frames": args.frames,
                       "cpu_baseline_fps_headline": CPU_BASELINE_FPS,
                       "rows": rows}, f, indent=2)
        print(f"wrote {args.out}")
        return

    r = measure(args.scene, args.width, args.height, args.frames, args.backend,
                batch=args.batch, tile_h=args.tile_h, objects=args.objects)
    mpix = r["pixels"] * r["fps"] / 1e6
    vs = (r["fps"] / CPU_BASELINE_FPS) if CPU_BASELINE_FPS else None
    tag = f" batch={args.batch}" if args.batch > 1 else ""
    print(json.dumps({
        "metric": f"fps@{args.width}x{args.height} {args.scene} scene "
                  f"({args.backend}{tag})",
        "value": round(r["fps"], 2),
        "unit": "frames/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "extra": {"frame_ms": round(r["frame_ms"], 3),
                  "Mpix_per_s": round(mpix, 1),
                  "Mtri_per_s": round(r["tris"] * r["fps"] / 1e6, 3),
                  "triangles": r["tris"],
                  **({"batch": args.batch} if args.batch > 1 else {})},
    }))


if __name__ == "__main__":
    main()
