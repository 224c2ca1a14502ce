"""On-chip validation: render every benchmark scene family on the real TPU
(Pallas backend) and compare against the golden oracle.

The CPU test suite runs the kernel in interpret mode, which does NOT prove the
kernel compiles or runs correctly on hardware (see docs/KERNEL.md for observed
failure modes, including a chip-crashing DMA). Run this after any kernel change:

    python tools/tpu_validate.py        # ~10 min, mostly remote compiles
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def mismatch(a: np.ndarray, b: np.ndarray, tol: int = 1) -> float:
    def ch(p):
        p = p.astype(np.int64)
        return np.stack([(p >> 16) & 255, (p >> 8) & 255, p & 255], -1)
    return float((np.abs(ch(a) - ch(b)).max(-1) > tol).mean())


def main() -> int:
    import jax
    import jax.numpy as jnp

    from swift3drenderer_tpu.camera import Camera, Input
    from swift3drenderer_tpu.config import DEFAULT_CONFIG
    from swift3drenderer_tpu.golden import render_frame as golden_render
    from swift3drenderer_tpu.models import SCENES, stress_scene
    from swift3drenderer_tpu.ops.raster_pallas import render_frame_pallas
    from swift3drenderer_tpu.renderer import scene_to_device

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}")
    if backend == "cpu":
        print("WARNING: no TPU visible — this validates interpret mode only")

    cases = [
        ("tetrahedron", SCENES["tetrahedron"](seed=0), "nearest", None),
        ("icosahedron+bilinear", SCENES["icosahedron"](seed=0), "bilinear", None),
        ("anisotropic", SCENES["anisotropic"](seed=0), "nearest", None),
        ("clipping(fly)", SCENES["clipping"](seed=0), "nearest", "fly"),
        ("default", SCENES["default"](seed=0), "nearest", None),
        ("regular_floor", SCENES["regular_floor"](seed=0), "nearest", None),
        # 3078 slots: single pass (B=1 cap 4096) but a windowed DMA id table —
        # the real multipass checks run below with cap_override.
        ("stress-3078slot", stress_scene(seed=0, objects=128), "nearest", None),
    ]
    failures = 0
    for name, scene, sampling, mode in cases:
        cfg = dataclasses.replace(DEFAULT_CONFIG, sampling=sampling)
        dev = scene_to_device(scene)
        cam = Camera()
        m = cam.update(Input(), force_update=True)
        if mode == "fly":
            for step in range(8):
                m = cam.update(Input(up=2.0))
        interpret = backend == "cpu"
        px, _ = render_frame_pallas(dev, jnp.asarray(m, jnp.float32),
                                    width=320, height=240, config=cfg,
                                    interpret=interpret)
        gp, _ = golden_render(scene, m, 320, 240, config=cfg)
        frac = mismatch(gp, np.asarray(px))
        ok = frac < 0.005
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'}  {name:22s} "
              f"({scene.num_triangles:5d} tris)  mismatch {frac * 100:.3f}%",
              flush=True)

    # Tall-tile kernel (the adaptive 4K default): tile_h=128 vs golden.
    from swift3drenderer_tpu.ops.raster_pallas import rasterize_pallas
    from swift3drenderer_tpu.renderer import build_setup

    scene = SCENES["default"](seed=0)
    dev = scene_to_device(scene)
    m = jnp.asarray(Camera().update(Input(), force_update=True), jnp.float32)
    setup = build_setup(dev, m, width=320, height=240, config=DEFAULT_CONFIG)
    px, _ = rasterize_pallas(
        setup, dev["textures"], width=320, height=240,
        background=DEFAULT_CONFIG.background_packed, tile_h=128,
        interpret=(jax.default_backend() == "cpu"))
    gp, _ = golden_render(scene, np.asarray(m), 320, 240)
    frac = mismatch(gp, np.asarray(px))
    ok = frac < 0.005
    failures += not ok
    print(f"{'PASS' if ok else 'FAIL'}  {'tile_h=128':22s} "
          f"({scene.num_triangles:5d} tris)  mismatch {frac * 100:.3f}%",
          flush=True)

    # Non-power-of-two tile height (round 3: any multiple of 8; 240 = 2x120
    # rows exactly) + the strip-height legalization (default 16 -> 8 at 120).
    px, _ = rasterize_pallas(
        setup, dev["textures"], width=320, height=240,
        background=DEFAULT_CONFIG.background_packed, tile_h=120,
        interpret=(jax.default_backend() == "cpu"))
    frac = mismatch(gp, np.asarray(px))
    ok = frac < 0.005
    failures += not ok
    print(f"{'PASS' if ok else 'FAIL'}  {'tile_h=120':22s} "
          f"({scene.num_triangles:5d} tris)  mismatch {frac * 100:.3f}%",
          flush=True)

    # Real multipass on hardware (cap_override=1024 -> 3 passes; without it
    # this 3078-slot scene fits the 4096-slot single-pass cap): sequential
    # depth-merged passes with the lax.cond dead-chunk skip, then spatial
    # partitioning at tile_h=128 (id-plane merge + tall tiles).
    scene = stress_scene(seed=0, objects=128)
    dev = scene_to_device(scene)
    m = jnp.asarray(Camera().update(Input(), force_update=True), jnp.float32)
    setup = build_setup(dev, m, width=320, height=240, config=DEFAULT_CONFIG)
    gp, _ = golden_render(scene, np.asarray(m), 320, 240)
    for label, spatial, th in (("multipass-seq", False, 64),
                               ("multipass-spatial128", True, 128)):
        px, _ = rasterize_pallas(
            setup, dev["textures"], width=320, height=240,
            background=DEFAULT_CONFIG.background_packed, tile_h=th,
            spatial=spatial, cap_override=1024,
            interpret=(jax.default_backend() == "cpu"))
        frac = mismatch(gp, np.asarray(px))
        ok = frac < 0.005
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'}  {label:22s} "
              f"({scene.num_triangles:5d} tris)  mismatch {frac * 100:.3f}%",
              flush=True)

    # Row-band sharded kernel path on hardware: render the default scene as
    # two y_offset bands (the exact per-device computation of the fb-sharded
    # mesh, bilinear sampling) and stitch — must match a golden full frame.

    cfg = dataclasses.replace(DEFAULT_CONFIG, sampling="bilinear")
    scene = SCENES["default"](seed=0)
    dev = scene_to_device(scene)
    m = jnp.asarray(Camera().update(Input(), force_update=True), jnp.float32)
    setup = build_setup(dev, m, width=320, height=240, config=cfg)
    bands = []
    for y0 in (0, 120):
        px, _ = rasterize_pallas(
            setup, dev["textures"], width=320, height=120,
            background=cfg.background_packed, y_offset=y0,
            interpret=(jax.default_backend() == "cpu"), sampling=cfg.sampling)
        bands.append(np.asarray(px))
    gp, _ = golden_render(scene, np.asarray(m), 320, 240, config=cfg)
    frac = mismatch(gp, np.concatenate(bands, axis=0))
    ok = frac < 0.005
    failures += not ok
    print(f"{'PASS' if ok else 'FAIL'}  {'banded+bilinear':22s} "
          f"({scene.num_triangles:5d} tris)  mismatch {frac * 100:.3f}%",
          flush=True)

    # Bucketed live-resize compile on hardware: an odd window size rendered
    # through the geometric compile buckets (raster extent at the bucket size,
    # true dims clamp coverage) must match the exact-size compile per the
    # drift bound (FMA contraction can flip isolated edge pixels between the
    # two programs — same class as pallas-vs-xla, docs/STATUS.md).
    from swift3drenderer_tpu.renderer import Renderer

    scene = SCENES["default"](seed=0)
    r = Renderer(scene, backend="pallas")
    cam_m = np.asarray(Camera().update(Input(), force_update=True))
    bpx, _ = r.render(cam_m, 300, 212, bucketed=True)
    epx, _ = r.render(cam_m, 300, 212)
    frac = mismatch(np.asarray(bpx), np.asarray(epx))
    ok = frac < 0.005
    failures += not ok
    print(f"{'PASS' if ok else 'FAIL'}  {'bucketed-resize':22s} "
          f"({scene.num_triangles:5d} tris)  mismatch {frac * 100:.3f}%",
          flush=True)

    # Serving batch on hardware: B=4 camera batch in ONE kernel dispatch must
    # reproduce each single-frame render bit-exactly (same kernel program,
    # batch rides the grid).
    cams = []
    cam = Camera()
    cams.append(cam.update(Input(), force_update=True).copy())
    for i in range(3):
        cams.append(cam.update(Input(up=1.0, mouse=(30.0 * i, 5.0))).copy())
    ms = np.stack(cams)
    bpx, _ = r.render_batch(ms, 320, 240)
    worst = 0.0
    for i in range(4):
        spx, _ = r.render(ms[i], 320, 240)
        worst = max(worst, mismatch(np.asarray(bpx[i]), np.asarray(spx)))
    ok = worst == 0.0
    failures += not ok
    print(f"{'PASS' if ok else 'FAIL'}  {'batch-B4-vs-single':22s} "
          f"({scene.num_triangles:5d} tris)  mismatch {worst * 100:.3f}%",
          flush=True)

    # shard_map path on hardware: a single-device (frame=1, fb=1) mesh runs
    # the real sharded program (shard_map + butterfly/composite code paths
    # trivially degenerate) on the chip — the 8-device virtual-mesh tests are
    # CPU-only, so this is the one hardware run of the collective program.
    from swift3drenderer_tpu.parallel.sharding import (make_mesh,
                                                       render_scene_sharded)

    mesh = make_mesh(n_frame=1, n_fb=1)
    spx, _ = render_scene_sharded(
        scene_to_device(scene), jnp.asarray(cam_m, jnp.float32), width=320, height=240,
        mesh=mesh, backend="pallas",
        interpret=(jax.default_backend() == "cpu"))
    gp, _ = golden_render(scene, cam_m, 320, 240)
    frac = mismatch(gp, np.asarray(spx))
    ok = frac < 0.005
    failures += not ok
    print(f"{'PASS' if ok else 'FAIL'}  {'shard_map-1dev':22s} "
          f"({scene.num_triangles:5d} tris)  mismatch {frac * 100:.3f}%",
          flush=True)

    # Texture-paged multipass on hardware: 128 textures (> the 96-texture
    # VMEM page) render via per-page passes merged by (depth, global id).
    import swift3drenderer_tpu.models.scene as scene_mod
    from swift3drenderer_tpu.models.textures import default_texture_words

    big_tex = np.concatenate([default_texture_words(2)] * 64)
    paged = scene_mod.stress_scene(seed=0, objects=24, textures=big_tex)
    tex = paged.attr_tex.copy()
    tri_tex = paged.attribute_indices.reshape(-1, 3)
    for t, corners in enumerate(tri_tex):
        for a in corners:
            if tex[a] >= 0:
                tex[a] = t % 128
    paged.attr_tex = tex
    paged.validate()
    px, _ = render_frame_pallas(
        scene_to_device(paged), jnp.asarray(cam_m, jnp.float32), width=320, height=240,
        interpret=(jax.default_backend() == "cpu"))
    gp, _ = golden_render(paged, cam_m, 320, 240)
    frac = mismatch(gp, np.asarray(px))
    ok = frac < 0.005
    failures += not ok
    print(f"{'PASS' if ok else 'FAIL'}  {'texture-paged-128':22s} "
          f"({paged.num_triangles:5d} tris)  mismatch {frac * 100:.3f}%",
          flush=True)

    # 10k-triangle stress scene on hardware (round 4): the compact-early
    # front-end (triangle pre-cull + per-chunk clip/setup) + live-compacted
    # multipass — the largest on-chip golden check (earlier rounds topped out
    # at 3078 slots). Camera pitched down so the object field fills the frame.
    big = stress_scene(seed=0, objects=840)
    cam = Camera()
    cam.update(Input(), force_update=True)
    m_big = cam.update(Input(mouse=(0.0, -35.0)))
    px, _ = render_frame_pallas(
        scene_to_device(big), jnp.asarray(m_big, jnp.float32),
        width=320, height=240, interpret=(backend == "cpu"))
    gp, _ = golden_render(big, m_big, 320, 240)
    frac = mismatch(gp, np.asarray(px))
    ok = frac < 0.005
    failures += not ok
    print(f"{'PASS' if ok else 'FAIL'}  {'stress-10k-compact':22s} "
          f"({big.num_triangles:5d} tris)  mismatch {frac * 100:.3f}%",
          flush=True)

    # Corners-ids path vs plain compacted multipass (round 5): the
    # triangle-sharded per-device pipeline (compact-early + global winner
    # ids) must reproduce the plain compacted multipass on hardware, up to
    # the documented cross-program FMA-contraction drift class (isolated
    # channel-LSB flips, docs/KERNEL.md "Numerics").
    import swift3drenderer_tpu.ops.raster_pallas as _rp
    from swift3drenderer_tpu.renderer import build_corners

    _cfg = DEFAULT_CONFIG
    _corners = jax.tree.map(
        lambda a: a[None],
        build_corners(scene_to_device(big), jnp.asarray(m_big, jnp.float32),
                      width=320, height=240, config=_cfg))
    _kw = dict(near=_cfg.near, factor=_cfg.factor(240), half_w=160.0,
               half_h=120.0, min_area=_cfg.min_area, width=320, height=240,
               background=_cfg.background_packed, tile_h=64, tile_w=128,
               y_offset=0, interpret=(backend == "cpu"),
               sampling=_cfg.sampling)
    _pc, _ = _rp._rasterize_corners_compacted(
        _corners, scene_to_device(big)["textures"], cap=2048, **_kw)
    _ps, _, _ = _rp._rasterize_corners_ids(
        _corners, scene_to_device(big)["textures"], cap=2048, **_kw)
    frac = mismatch(np.asarray(_pc[0]), np.asarray(_ps[0]))
    ok = frac == 0.0
    failures += not ok
    print(f"{'PASS' if ok else 'FAIL'}  {'corners-ids-vs-seq10k':22s} "
          f"({big.num_triangles:5d} tris)  mismatch {frac * 100:.3f}%",
          flush=True)

    # 100k-triangle scale proof (round 5): the stress100k family through the
    # compact-early multipass; golden cross-check at reduced resolution (the
    # golden oracle loops 100k triangles in NumPy — minutes-cheap at
    # 320x240). Skippable for quick runs: --no-100k.
    if "--no-100k" not in sys.argv:
        from swift3drenderer_tpu.models import stress100k_scene

        huge = stress100k_scene(seed=0)
        cam = Camera()
        cam.update(Input(), force_update=True)
        m_huge = cam.update(Input(mouse=(0.0, -35.0)))
        px, _ = render_frame_pallas(
            scene_to_device(huge), jnp.asarray(m_huge, jnp.float32),
            width=320, height=240, interpret=(backend == "cpu"))
        gp, _ = golden_render(huge, m_huge, 320, 240)
        frac = mismatch(gp, np.asarray(px))
        ok = frac < 0.005
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'}  {'stress100k-compact':22s} "
              f"({huge.num_triangles:5d} tris)  mismatch {frac * 100:.3f}%",
              flush=True)

    # Segmented front-end under a camera BATCH combined with texture paging:
    # B=2 halves the per-pass slot cap AND the 128-texture set pages through
    # VMEM — the two multipass axes composed in one dispatch chain.
    ms2 = np.stack([cam_m, np.asarray(m_big)])
    from swift3drenderer_tpu.ops.raster_pallas import render_batch_pallas
    bpx, _ = render_batch_pallas(
        scene_to_device(paged), jnp.asarray(ms2, jnp.float32),
        width=320, height=240, interpret=(backend == "cpu"))
    worst = 0.0
    for i, mm in enumerate(ms2):
        gp, _ = golden_render(paged, np.asarray(mm), 320, 240)
        worst = max(worst, mismatch(gp, np.asarray(bpx[i])))
    ok = worst < 0.005
    failures += not ok
    print(f"{'PASS' if ok else 'FAIL'}  {'paged+batchB2':22s} "
          f"({paged.num_triangles:5d} tris)  mismatch {worst * 100:.3f}%",
          flush=True)

    # Triangle-sharded path at kernel parity on a 10k scene, n=1 mesh on the
    # chip (the 8-device runs are CPU-only): the compacted id-tracking
    # multipass + shard_map composite, vs the plain render — bit-exact — plus
    # a coarse single-chip timing proxy of the id-tracking overhead (chained
    # renders; tunnel noise ~±10%, see BASELINE.md).
    import time as _time
    dev_big = scene_to_device(big)
    mj = jnp.asarray(m_big, jnp.float32)
    spx, _ = render_scene_sharded(dev_big, mj, width=320, height=240,
                                  mesh=mesh, backend="pallas",
                                  interpret=(backend == "cpu"))
    ppx, _ = render_frame_pallas(dev_big, mj, width=320, height=240,
                                 interpret=(backend == "cpu"))
    # The sharded path's id-tracking program is a distinct compile from the
    # plain multipass: allow the documented channel-LSB drift class, require
    # zero pixels beyond it (tol=1).
    exact = mismatch(np.asarray(spx), np.asarray(ppx)) == 0.0
    def _t(fn):
        fn()  # warm
        t0 = _time.perf_counter()
        for _ in range(10):
            out = fn()
        np.asarray(out[0]).sum()
        return (_time.perf_counter() - t0) / 10
    t_plain = _t(lambda: render_frame_pallas(
        dev_big, mj, width=320, height=240, interpret=(backend == "cpu")))
    t_shard = _t(lambda: render_scene_sharded(
        dev_big, mj, width=320, height=240, mesh=mesh, backend="pallas",
        interpret=(backend == "cpu")))
    failures += not exact
    print(f"{'PASS' if exact else 'FAIL'}  {'tri-sharded-n1-10k':22s} "
          f"({big.num_triangles:5d} tris)  tol1-exact={exact}  "
          f"n1-overhead {t_shard / max(t_plain, 1e-9):.2f}x "
          f"({t_plain * 1e3:.1f} -> {t_shard * 1e3:.1f} ms incl. host sync)",
          flush=True)

    # Strip-height knob variant: tile_h=120 with EXPLICIT 24-row strips (the
    # ab_headline A/B pairing; distinct kernel build from the legalized-8
    # default). The S3D_*_STRIP_H knobs bind at module import, so this runs in
    # a subprocess. Skipped under --no-subprocess (interpret-mode CI shortcut).
    import subprocess
    import sys as _sys
    if "--no-subprocess" not in _sys.argv:
        code = (
            "import os, jax\n"
            "if os.environ.get('S3D_CHILD_CPU') == '1':\n"
            "    jax.config.update('jax_platforms', 'cpu')\n"
            "import dataclasses, numpy as np, jax.numpy as jnp\n"
            "from swift3drenderer_tpu.camera import Camera, Input\n"
            "from swift3drenderer_tpu.config import DEFAULT_CONFIG\n"
            "from swift3drenderer_tpu.golden import render_frame as gr\n"
            "from swift3drenderer_tpu.models import SCENES\n"
            "from swift3drenderer_tpu.ops.raster_pallas import render_frame_pallas\n"
            "from swift3drenderer_tpu.renderer import scene_to_device\n"
            "scene = SCENES['default'](seed=0)\n"
            "m = Camera().update(Input(), force_update=True)\n"
            "px, _ = render_frame_pallas(scene_to_device(scene),\n"
            "    jnp.asarray(m, jnp.float32), width=320, height=240,\n"
            "    tile_h=120, interpret=(jax.default_backend() == 'cpu'))\n"
            "gp, _ = gr(scene, m, 320, 240)\n"
            "import sys; sys.path.insert(0, 'tools')\n"
            "from tpu_validate import mismatch\n"
            "frac = mismatch(gp, np.asarray(px))\n"
            "assert frac < 0.005, frac\n"
            "print(f'strip24 mismatch {frac*100:.3f}%')\n"
        )
        env = dict(os.environ, S3D_NEAREST_STRIP_H="24", S3D_FETCH_STRIP_H="24",
                   S3D_CHILD_CPU="1" if backend == "cpu" else "0")
        res = subprocess.run([_sys.executable, "-c", code], env=env,
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__))))
        ok = res.returncode == 0
        failures += not ok
        detail = (res.stdout.strip().splitlines() or ["?"])[-1] if ok \
            else res.stderr.strip().splitlines()[-1][:70]
        print(f"{'PASS' if ok else 'FAIL'}  {'tile120+strip24':22s} ({detail})",
              flush=True)

    # Optional randomized hardware fuzz: random scene family / seed / pose /
    # odd resolution, pallas-on-chip vs golden (the CPU suite fuzzes interpret
    # mode only). Run: python tools/tpu_validate.py --fuzz 12
    ntrials = 0
    if "--fuzz" in _sys.argv:
        ntrials = int(_sys.argv[_sys.argv.index("--fuzz") + 1])
    for trial in range(ntrials):
        rng = np.random.default_rng(7000 + trial)
        name = list(SCENES)[int(rng.integers(0, len(SCENES)))]
        scene = SCENES[name](seed=int(rng.integers(0, 100)))
        sampling = "bilinear" if rng.integers(0, 4) == 0 else "nearest"
        cfg = dataclasses.replace(DEFAULT_CONFIG, sampling=sampling)
        dev = scene_to_device(scene)
        cam = Camera()
        m = cam.update(Input(), force_update=True)
        for _ in range(int(rng.integers(1, 6))):
            m = cam.update(Input(
                up=float(rng.uniform(0, 2)), down=float(rng.uniform(0, 1)),
                left=float(rng.uniform(0, 1)), right=float(rng.uniform(0, 1)),
                mouse=(float(rng.uniform(-120, 120)),
                       float(rng.uniform(-80, 80)))))
        w = int(rng.integers(20, 60)) * 8
        h = int(rng.integers(12, 40)) * 8
        px, _ = render_frame_pallas(dev, jnp.asarray(m, jnp.float32),
                                    width=w, height=h, config=cfg,
                                    interpret=(backend == "cpu"))
        gp, _ = golden_render(scene, m, w, h, config=cfg)
        frac = mismatch(gp, np.asarray(px))
        ok = frac < 0.005
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'}  fuzz[{trial}] {name:12s} "
              f"{sampling:8s} {w}x{h}  mismatch {frac * 100:.3f}%", flush=True)

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
