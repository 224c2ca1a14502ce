"""Pallas rasterizer backend tests (interpret mode on CPU): binning correctness and
pixel parity with the XLA backend and the golden oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from swift3drenderer_tpu.camera import Camera, Input
from swift3drenderer_tpu.config import DEFAULT_CONFIG
from swift3drenderer_tpu.golden import render_frame as golden_render
from swift3drenderer_tpu.models import (
    clipping_scene,
    default_scene,
    icosahedron_scene,
    tetrahedron_scene,
)
from swift3drenderer_tpu.ops.raster_pallas import (
    _SEG_K,
    bin_segments,
    bin_triangles,
)
from swift3drenderer_tpu.renderer import Renderer, build_setup, scene_to_device

from conftest import pixel_mismatch_fraction


def identity_camera():
    return Camera().update(Input(), force_update=True)


def test_binning_partition_matches_stable_argsort():
    # bin_triangles' single-key-sort stable partition (touching slots first,
    # BOTH groups ascending) must equal a stable argsort of ~touch — the
    # ascending order is what preserves reference depth-tie semantics. Drive
    # the SHIPPED function on synthetic setups whose touch matrix is known.
    rng = np.random.default_rng(42)
    for _ in range(10):
        s = 48
        w, h, tile_h = 256, 64, 8        # 2 x 8 tile grid
        xmin = rng.integers(0, w, s); xmax = xmin + rng.integers(0, w, s)
        ymin = rng.integers(0, h, s); ymax = ymin + rng.integers(0, h, s)
        live = rng.random(s) < 0.8
        setup = {k: jnp.asarray(v.astype(np.int32)) for k, v in
                 dict(xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax).items()}
        setup["live"] = jnp.asarray(live)
        ids, counts = bin_triangles(setup, width=w, height=h,
                                    tile_h=tile_h, tile_w=128)
        ntx, nty = 2, 8
        tx = np.arange(ntx); ty = np.arange(nty)
        touch_x = ((tx[None] >= np.clip(xmin // 128, 0, ntx - 1)[:, None])
                   & (tx[None] <= np.clip(xmax // 128, 0, ntx - 1)[:, None]))
        touch_y = ((ty[None] >= np.clip(ymin // tile_h, 0, nty - 1)[:, None])
                   & (ty[None] <= np.clip(ymax // tile_h, 0, nty - 1)[:, None]))
        touch = ((touch_y[:, :, None] & touch_x[:, None, :])
                 & live[:, None, None]).reshape(s, nty * ntx).T
        ref = np.argsort(~touch, axis=1, kind="stable")
        np.testing.assert_array_equal(np.asarray(ids), ref)
        np.testing.assert_array_equal(np.asarray(counts)[:, 0],
                                      touch.sum(axis=1))


def test_binning_covers_live_triangles():
    scene = default_scene(seed=0)
    dev = scene_to_device(scene)
    m = jnp.asarray(identity_camera())
    setup = build_setup(dev, m, width=256, height=192, config=DEFAULT_CONFIG)
    ids, counts = bin_triangles(setup, width=256, height=192, tile_h=8, tile_w=128)
    ids, counts = np.asarray(ids), np.asarray(counts)[:, 0]
    live = np.asarray(setup["live"])
    xmin = np.asarray(setup["xmin"]); xmax = np.asarray(setup["xmax"])
    ymin = np.asarray(setup["ymin"]); ymax = np.asarray(setup["ymax"])
    ntx = 2
    # Every live triangle appears in exactly the tiles its bbox touches.
    for s in np.nonzero(live)[0]:
        for t in range(ids.shape[0]):
            ty, tx = t // ntx, t % ntx
            touches = (xmin[s] // 128 <= tx <= xmax[s] // 128
                       and ymin[s] // 8 <= ty <= ymax[s] // 8)
            listed = s in ids[t, : counts[t]]
            assert touches == listed, (s, t)
    # Dead slots never appear.
    for t in range(ids.shape[0]):
        assert not set(ids[t, : counts[t]]) & set(np.nonzero(~live)[0])
    # Ids within each tile are ascending (depth-tie order).
    for t in range(ids.shape[0]):
        lst = ids[t, : counts[t]]
        assert np.all(np.diff(lst) > 0) or counts[t] <= 1


def test_bin_segments_partition_matches_touch_sets():
    # The segmented binner's (per-tile segment) ∪ (shared broadband list,
    # restricted to touching slots) must equal each tile's exact touching
    # set, with segments ascending and broadband = exactly the slots whose
    # bbox covers > _SEG_K tiles. Random synthetic setups, exact check.
    rng = np.random.default_rng(7)
    for _ in range(10):
        s = 160
        w, h, tile_h = 512, 128, 16      # 4 x 8 tile grid
        ntx, nty = 4, 8
        xmin = rng.integers(-64, w, s); xmax = xmin + rng.integers(0, 300, s)
        ymin = rng.integers(-32, h, s); ymax = ymin + rng.integers(0, 90, s)
        live = rng.random(s) < 0.8
        is_tex = rng.random(s) < 0.3
        setup = {k: jnp.asarray(v.astype(np.int32)) for k, v in
                 dict(xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax).items()}
        setup["live"] = jnp.asarray(live)
        setup["is_tex"] = jnp.asarray(is_tex)
        ids, counts, ncol, starts, bb, bb_cnt, bb_ncol = bin_segments(
            setup, width=w, height=h, tile_h=tile_h, tile_w=128)
        flat = np.asarray(ids).reshape(-1)
        counts, starts = np.asarray(counts), np.asarray(starts)
        ncol = np.asarray(ncol)
        bb_list = np.asarray(bb).reshape(-1)[: int(bb_cnt)]
        # Broadband is partitioned color-first, each half ascending.
        bcol = bb_list[: int(bb_ncol)]
        btex = bb_list[int(bb_ncol):]
        assert not is_tex[bcol].any() and is_tex[btex].all()
        for half in (bcol, btex):
            assert np.all(np.diff(half) > 0) or len(half) <= 1

        txmin = np.clip(xmin // 128, 0, ntx - 1)
        txmax = np.clip(xmax // 128, 0, ntx - 1)
        tymin = np.clip(ymin // tile_h, 0, nty - 1)
        tymax = np.clip(ymax // tile_h, 0, nty - 1)
        vis = live & (ymax >= 0) & (ymin < h)
        area = (txmax - txmin + 1) * (tymax - tymin + 1)
        big = set(np.nonzero(vis & (area > _SEG_K))[0])
        assert set(bb_list) == big
        for t in range(nty * ntx):
            ty, tx = t // ntx, t % ntx
            seg = flat[starts[t]: starts[t] + counts[t]]
            # Material partition: color prefix then textured, each ascending.
            scol, stex = seg[: ncol[t]], seg[ncol[t]:]
            assert not is_tex[scol].any() and is_tex[stex].all()
            for half in (scol, stex):
                assert np.all(np.diff(half) > 0) or len(half) <= 1
            touching = {s_ for s_ in np.nonzero(vis)[0]
                        if txmin[s_] <= tx <= txmax[s_]
                        and tymin[s_] <= ty <= tymax[s_]}
            assert set(seg) == touching - big, (t, seg, touching)
            # Broadband members of this tile come from the shared list.
            assert (touching & big) <= set(bb_list)


def test_pallas_matches_golden_tetrahedron():
    scene = tetrahedron_scene(seed=0)
    m = identity_camera()
    gp, gd = golden_render(scene, m, 320, 240)
    px, depth = Renderer(scene, backend="pallas").render(m, 320, 240)
    assert pixel_mismatch_fraction(gp, px, tol=1) < 0.002
    both = (gd > 0) & (depth > 0)
    np.testing.assert_allclose(depth[both], gd[both], rtol=2e-3)


def test_pallas_matches_xla():
    # Same formulas and dtype; XLA's per-program FMA contraction choices still
    # perturb a handful of edge/tie pixels, so allow a tiny mismatch fraction.
    # Bounded across ALL scene families, not just the default (the drift is a
    # program property, not a scene property — see docs/KERNEL.md "Numerics").
    from swift3drenderer_tpu.models import SCENES

    m = identity_camera()
    for name in ("default", "tetrahedron", "icosahedron", "anisotropic",
                 "clipping"):
        scene = SCENES[name](seed=0)
        px_x, d_x = Renderer(scene, backend="xla").render(m, 320, 240)
        px_p, d_p = Renderer(scene, backend="pallas").render(m, 320, 240)
        assert pixel_mismatch_fraction(px_p, px_x, tol=1) < 5e-4, name
        both = (d_x > 0) & (d_p > 0)
        np.testing.assert_allclose(d_p[both], d_x[both], rtol=1e-4,
                                   err_msg=name)


def test_pallas_clipping_flight():
    scene = clipping_scene(seed=0)
    cam = Camera()
    r = Renderer(scene, backend="pallas")
    for step in range(8):
        m = cam.update(Input(up=2.0), force_update=(step == 0))
        gp, _ = golden_render(scene, m, 160, 120)
        px, _ = r.render(m, 160, 120)
        assert pixel_mismatch_fraction(gp, px, tol=1) < 0.004, step


def test_pallas_non_tile_aligned_resolution():
    scene = tetrahedron_scene(seed=0)
    m = identity_camera()
    px_x, _ = Renderer(scene, backend="xla").render(m, 123, 97)
    px_p, _ = Renderer(scene, backend="pallas").render(m, 123, 97)
    assert pixel_mismatch_fraction(px_p, px_x, tol=1) < 1e-3


def test_pallas_multi_pass_large_scene():
    # Scenes beyond the per-pass slot cap render in depth-merged passes.
    # cap_override forces >= 3 passes here: a single frame's real cap is
    # MAX_SLOTS_PER_PASS_B1 = 4096, which this 3078-slot scene would fit —
    # without the override the multipass machinery (incl. the lax.cond
    # dead-trailing-chunk skip) would silently go untested.
    from swift3drenderer_tpu.models import stress_scene
    from swift3drenderer_tpu.ops.raster_pallas import rasterize_pallas

    scene = stress_scene(seed=0, objects=128)
    assert 2 * scene.num_triangles > 2 * 1024  # >= 3 passes at cap 1024
    dev = scene_to_device(scene)
    m = jnp.asarray(identity_camera(), jnp.float32)
    setup = build_setup(dev, m, width=160, height=120, config=DEFAULT_CONFIG)
    px, _ = rasterize_pallas(
        setup, dev["textures"], width=160, height=120,
        background=DEFAULT_CONFIG.background_packed, interpret=True,
        cap_override=1024)
    gp, _ = golden_render(scene, identity_camera(), 160, 120)
    assert pixel_mismatch_fraction(gp, np.asarray(px), tol=1) < 0.004


def test_pallas_compact_early_bitexact_and_small_scene_path_unchanged():
    # Round-4 front-end compaction: clip/setup run per cond-skipped triangle
    # chunk on conservatively pre-culled, compacted corners. Pixels must be
    # BIT-IDENTICAL to the round-3 full-table path (the depth plane may
    # drift ~1 ULP between the differently-compiled programs — the
    # documented pallas-vs-pallas program-drift class, docs/KERNEL.md
    # "Numerics"), and small scenes must keep the direct build_setup path
    # (no compaction ops in their front end).
    import swift3drenderer_tpu.ops.raster_pallas as rp
    from swift3drenderer_tpu.models import stress_scene

    calls = []
    real = rp._rasterize_corners_compacted

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    scene = stress_scene(seed=0, objects=220)  # 2641 tris -> 5282 slots > cap
    assert 2 * scene.num_triangles > rp.MAX_SLOTS_PER_PASS_B1
    dev = scene_to_device(scene)
    m = identity_camera()
    # Flight pose that exercises near-plane straddlers too.
    cam = Camera()
    cam.update(Input(), force_update=True)
    m2 = cam.update(Input(up=2.0, mouse=(0.0, -40.0)))
    try:
        rp._rasterize_corners_compacted = spy
        for mat in (m, m2):
            mj = jnp.asarray(mat, jnp.float32)
            px_new, d_new = rp.render_frame_pallas(
                dev, mj, width=160, height=120, interpret=True)
            px_old, d_old = rp.render_frame_pallas(
                dev, mj, width=160, height=120, interpret=True,
                compact_early=False)
            np.testing.assert_array_equal(np.asarray(px_new),
                                          np.asarray(px_old))
            np.testing.assert_allclose(np.asarray(d_new),
                                       np.asarray(d_old), rtol=1e-4)
        assert calls  # the large scene actually took a compacted path
        calls.clear()
        small = tetrahedron_scene(seed=0)
        sdev = scene_to_device(small)
        rp.render_frame_pallas(sdev, jnp.asarray(m, jnp.float32),
                               width=160, height=120, interpret=True)
        assert not calls  # small scenes: front-end path unchanged
    finally:
        rp._rasterize_corners_compacted = real


def test_pallas_corners_ids_matches_compacted():
    # Round-5 _rasterize_corners_ids (the triangle-sharded path's per-device
    # pipeline: compact-early front-end + global winner ids) must reproduce
    # the plain compacted multipass up to the documented cross-program drift
    # class (docs/KERNEL.md "Numerics"): isolated channel-LSB flips, ~1 ULP
    # depth drift. Winner sets must agree everywhere, and the gid plane must
    # hold valid global slot ids exactly where a pixel has a winner.
    import swift3drenderer_tpu.ops.raster_pallas as rp
    from swift3drenderer_tpu.models import stress_scene
    from swift3drenderer_tpu.renderer import build_corners

    scene = stress_scene(seed=0, objects=220)  # 2641 tris -> 5282 slots
    dev = scene_to_device(scene)
    cam = Camera()
    cam.update(Input(), force_update=True)
    cfg = DEFAULT_CONFIG
    W, H = 320, 240
    for inp in (Input(), Input(up=2.0, mouse=(0.0, -40.0))):
        m = jnp.asarray(cam.update(inp), jnp.float32)
        corners = jax.tree.map(
            lambda a: a[None],
            build_corners(dev, m, width=W, height=H, config=cfg))
        kw = dict(near=cfg.near, factor=cfg.factor(H), half_w=W / 2.0,
                  half_h=H / 2.0, min_area=cfg.min_area, width=W, height=H,
                  background=cfg.background_packed, tile_h=64, tile_w=128,
                  y_offset=0, interpret=True, sampling=cfg.sampling)
        # cap 1024 forces >= 3 live triangle chunks through the while_loop.
        px_c, d_c = rp._rasterize_corners_compacted(
            corners, dev["textures"], cap=1024, **kw)
        px_i, d_i, gid = rp._rasterize_corners_ids(
            corners, dev["textures"], cap=1024, **kw)
        assert pixel_mismatch_fraction(np.asarray(px_c), np.asarray(px_i),
                                       tol=1) == 0.0
        np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_i),
                                   rtol=1e-4)
        # Winner sets are identical (background exactly where background).
        np.testing.assert_array_equal(np.asarray(d_c) > 0,
                                      np.asarray(d_i) > 0)
        g = np.asarray(gid[0])
        winners = np.asarray(d_i[0]) > 0
        assert (g[winners] >= 0).all()
        assert (g[winners] < 2 * scene.num_triangles).all()
        assert (g[~winners] == 2 ** 30).all()


def test_pallas_corners_ids_gid_base_offsets_globally():
    # gid_base shifts every winner id by 2*base without changing pixels —
    # what the triangle-sharded composite relies on for scene-wide ordering.
    import swift3drenderer_tpu.ops.raster_pallas as rp
    from swift3drenderer_tpu.models import stress_scene
    from swift3drenderer_tpu.renderer import build_corners

    scene = stress_scene(seed=1, objects=220)
    dev = scene_to_device(scene)
    cam = Camera()
    cam.update(Input(), force_update=True)
    cfg = DEFAULT_CONFIG
    W, H = 256, 128
    m = jnp.asarray(cam.update(Input(up=1.0)), jnp.float32)
    corners = jax.tree.map(
        lambda a: a[None], build_corners(dev, m, width=W, height=H,
                                         config=cfg))
    kw = dict(near=cfg.near, factor=cfg.factor(H), half_w=W / 2.0,
              half_h=H / 2.0, min_area=cfg.min_area, width=W, height=H,
              background=cfg.background_packed, tile_h=64, tile_w=128,
              y_offset=0, interpret=True, sampling=cfg.sampling, cap=1024)
    px0, d0, g0 = rp._rasterize_corners_ids(corners, dev["textures"], **kw)
    px7, d7, g7 = rp._rasterize_corners_ids(corners, dev["textures"],
                                            gid_base=700, **kw)
    np.testing.assert_array_equal(np.asarray(px0), np.asarray(px7))
    w = np.asarray(d0) > 0
    np.testing.assert_array_equal(np.asarray(g7)[w],
                                  np.asarray(g0)[w] + 1400)
    assert (np.asarray(g7)[~w] == 2 ** 30).all()


def test_triangle_prelive_is_conservative():
    # The pre-cull may only drop triangles whose BOTH slots triangle_setup
    # would kill anyway — verified against the full clip+setup liveness on a
    # random-ish flight pose with straddlers.
    from swift3drenderer_tpu.models import stress_scene
    from swift3drenderer_tpu.ops.raster_pallas import _triangle_prelive
    from swift3drenderer_tpu.renderer import build_corners

    scene = stress_scene(seed=3, objects=64)
    dev = scene_to_device(scene)
    cam = Camera()
    cam.update(Input(), force_update=True)
    for inp in (Input(), Input(up=3.0, mouse=(30.0, -25.0))):
        m = jnp.asarray(cam.update(inp), jnp.float32)
        corners = build_corners(dev, m, width=160, height=120,
                                config=DEFAULT_CONFIG)
        pre = np.asarray(_triangle_prelive(
            corners, width=160, height=120, near=DEFAULT_CONFIG.near,
            min_area=DEFAULT_CONFIG.min_area))
        setup = build_setup(dev, m, width=160, height=120,
                            config=DEFAULT_CONFIG)
        live_slots = np.asarray(setup["live"]).reshape(-1, 2)
        live_tri = live_slots.any(axis=1)
        # pre == False must imply both slots dead.
        assert not (live_tri & ~pre).any()


def test_pallas_tile_h_128_matches_golden():
    # tile_h=128 is the adaptive default at 4K+ (fewer grid steps); verify the
    # tall-tile kernel against golden at a small size.
    from swift3drenderer_tpu.ops.raster_pallas import rasterize_pallas

    scene = default_scene(seed=0)
    dev = scene_to_device(scene)
    m = jnp.asarray(identity_camera(), jnp.float32)
    setup = build_setup(dev, m, width=320, height=240, config=DEFAULT_CONFIG)
    px, _ = rasterize_pallas(
        setup, dev["textures"], width=320, height=240,
        background=DEFAULT_CONFIG.background_packed, tile_h=128,
        interpret=True)
    gp, _ = golden_render(scene, np.asarray(m), 320, 240)
    assert pixel_mismatch_fraction(gp, np.asarray(px), tol=1) < 0.002


def test_pallas_segmented_matches_resident_bitexact(monkeypatch):
    # The segmented front-end + strip-scoped kernel claims BIT-IDENTICAL
    # winners vs the flat resident path (order-independent depth-tie rule ==
    # sequential earlier-triangle-wins, reassociated). Verify exactly, pixels
    # and depth, on a small scene that normally takes the resident path.
    import swift3drenderer_tpu.ops.raster_pallas as rp

    scene = default_scene(seed=0)
    dev = scene_to_device(scene)
    m = jnp.asarray(identity_camera(), jnp.float32)
    setup = build_setup(dev, m, width=320, height=240, config=DEFAULT_CONFIG)
    kw = dict(width=320, height=240,
              background=DEFAULT_CONFIG.background_packed, interpret=True)
    flat_px, flat_d = rp.rasterize_pallas(setup, dev["textures"], **kw)
    monkeypatch.setattr(rp, "_FORCE_SEGMENTED", True)
    # The knob is read at trace time; drop the jit cache so the second call
    # actually retraces through the segmented path.
    rp.rasterize_pallas.clear_cache()
    seg_px, seg_d = rp.rasterize_pallas(setup, dev["textures"], **kw)
    rp.rasterize_pallas.clear_cache()  # don't leak the forced path to others
    np.testing.assert_array_equal(np.asarray(seg_px), np.asarray(flat_px))
    np.testing.assert_array_equal(np.asarray(seg_d), np.asarray(flat_d))


def test_pallas_non_pow2_tile_h_matches_golden():
    # Non-power-of-two tile heights (any multiple of 8) let resolutions tile
    # exactly (1080 = 9x120 — zero padded rows vs 6.7% waste at 128; the
    # shipped default at 120-divisible heights since round 3). The default
    # 16-row fetch strips don't divide 120, so this also exercises the
    # strip-height legalization (nearest divisor, larger on ties: 16 -> 24
    # at tile_h=120 — the on-chip-fastest headline config).
    from swift3drenderer_tpu.ops.raster_pallas import rasterize_pallas

    scene = default_scene(seed=0)
    dev = scene_to_device(scene)
    m = jnp.asarray(identity_camera(), jnp.float32)
    setup = build_setup(dev, m, width=320, height=240, config=DEFAULT_CONFIG)
    px, _ = rasterize_pallas(
        setup, dev["textures"], width=320, height=240,
        background=DEFAULT_CONFIG.background_packed, tile_h=120,
        interpret=True)
    gp, _ = golden_render(scene, np.asarray(m), 320, 240)
    assert pixel_mismatch_fraction(gp, np.asarray(px), tol=1) < 0.002


def test_pallas_tile_h_216_matches_golden():
    # tile_h=216 is the shipped 4K default (2160 = 10x216 exact fit, round 4);
    # the picker's choice is covered elsewhere, but the kernel itself must
    # also be exercised end-to-end at this tile height (ADVICE r4) — a 216-row
    # tile over a 240-row frame, with the paired 24-row fetch strips.
    from swift3drenderer_tpu.ops.raster_pallas import rasterize_pallas

    scene = default_scene(seed=0)
    dev = scene_to_device(scene)
    m = jnp.asarray(identity_camera(), jnp.float32)
    setup = build_setup(dev, m, width=320, height=240, config=DEFAULT_CONFIG)
    px, _ = rasterize_pallas(
        setup, dev["textures"], width=320, height=240,
        background=DEFAULT_CONFIG.background_packed, tile_h=216,
        interpret=True)
    gp, _ = golden_render(scene, np.asarray(m), 320, 240)
    assert pixel_mismatch_fraction(gp, np.asarray(px), tol=1) < 0.002


def test_pallas_wide_span_strips_match_golden():
    # At 512x384 the receding floor crosses ripmap-level boundaries inside
    # single fetch strips: the per-axis level offset (511 & ~(2L-1),
    # render.swift:94-111) jumps by hundreds of atlas rows there, so the
    # strip's touched row span exceeds 4 blocks and the fetch takes the
    # conditional midpoint-split path (round-5 _split_bounds — narrow strips
    # skip those reductions entirely). Golden parity over both sampling
    # modes covers the wide path AND the hoisted single-texture bounds
    # shortcut end-to-end.
    import dataclasses

    from swift3drenderer_tpu.models import SCENES

    m = identity_camera()
    for name, sampling in (("default", "nearest"),
                           ("anisotropic", "bilinear")):
        scene = SCENES[name](seed=0)
        cfg = dataclasses.replace(DEFAULT_CONFIG, sampling=sampling)
        gp, _ = golden_render(scene, m, 512, 384, config=cfg)
        px, _ = Renderer(scene, backend="pallas", config=cfg).render(
            m, 512, 384)
        assert pixel_mismatch_fraction(gp, px, tol=1) < 0.002, name


def test_adaptive_fetch_strip_rule_and_derived_legalization():
    # _pick_strip_h picks 24-row BILINEAR fetch strips at 4K heights (round
    # 4 sweep), 0 (= flat default) elsewhere; since round 5 the nearest path
    # uses constant 8-row strips instead (which divide every legal tile_h).
    # The tile_h=216 exact-fit pick stands. A DERIVED strip height that does
    # not divide tile_h must legalize silently (only EXPLICIT S3D_*_STRIP_H
    # knobs fail fast), and the rendered output must stay golden-exact
    # regardless of strip height.
    from swift3drenderer_tpu.ops.raster_pallas import (_pick_strip_h,
                                                       _pick_tile_h,
                                                       _rasterize_chunk)

    assert _pick_strip_h(2160) == 24
    assert _pick_strip_h(4320) == 24
    assert _pick_strip_h(1080) == 0
    assert _pick_strip_h(240) == 0
    # 2160 = 10x216 exact under the 256-row tile cap; 1080 keeps 120; 4320
    # (20x216) rides the same exact-fit rule; non-multiples fall back to 128.
    assert _pick_tile_h(None, 2160, 4096) == 216
    assert _pick_tile_h(None, 4320, 4096) == 216
    assert _pick_tile_h(None, 1080, 4096) == 120
    assert _pick_tile_h(None, 2176, 4096) == 128

    scene = default_scene(seed=0)
    dev = scene_to_device(scene)
    m = jnp.asarray(identity_camera(), jnp.float32)
    setup = build_setup(dev, m, width=320, height=240, config=DEFAULT_CONFIG)
    batched = jax.tree.map(lambda a: a[None], setup)
    kw = dict(width=320, height=240,
              background=DEFAULT_CONFIG.background_packed, tile_w=128,
              y_offset=0, interpret=True, sampling="nearest")
    # strip_h=32 does not divide tile_h=120: derived values legalize (to 24),
    # no ValueError, same pixels as the default strip pick.
    px, _ = _rasterize_chunk(batched, dev["textures"], tile_h=120,
                             strip_h=32, **kw)
    px0, _ = _rasterize_chunk(batched, dev["textures"], tile_h=120, **kw)
    gp, _ = golden_render(scene, np.asarray(m), 320, 240)
    assert pixel_mismatch_fraction(gp, np.asarray(px[0]), tol=1) < 0.002
    np.testing.assert_array_equal(np.asarray(px), np.asarray(px0))


def test_pallas_multipass_spatial_matches_golden():
    # Spatial slot partitioning reorders slots across passes; the
    # global-winner-id merge must still resolve depth ties to the smallest
    # original slot id (reference order), so output matches golden exactly
    # where the sequential multipass does.
    from swift3drenderer_tpu.models import stress_scene
    from swift3drenderer_tpu.ops.raster_pallas import rasterize_pallas

    scene = stress_scene(seed=0, objects=128)
    # cap_override forces real multipass (see test_pallas_multi_pass_large_scene).
    assert 2 * scene.num_triangles > 1024
    dev = scene_to_device(scene)
    m = jnp.asarray(identity_camera(), jnp.float32)
    setup = build_setup(dev, m, width=160, height=120, config=DEFAULT_CONFIG)
    seq_px, seq_d = rasterize_pallas(
        setup, dev["textures"], width=160, height=120,
        background=DEFAULT_CONFIG.background_packed, interpret=True,
        cap_override=1024)
    sp_px, sp_d = rasterize_pallas(
        setup, dev["textures"], width=160, height=120,
        background=DEFAULT_CONFIG.background_packed, interpret=True,
        spatial=True, cap_override=1024)
    np.testing.assert_array_equal(np.asarray(sp_px), np.asarray(seq_px))
    np.testing.assert_array_equal(np.asarray(sp_d), np.asarray(seq_d))
    gp, _ = golden_render(scene, np.asarray(m), 160, 120)
    assert pixel_mismatch_fraction(gp, np.asarray(sp_px), tol=1) < 0.004


def test_pallas_render_batch():
    scene = tetrahedron_scene(seed=0)
    m = identity_camera()
    ms = np.stack([m, m])
    r = Renderer(scene, backend="pallas")
    px, d = r.render_batch(ms, 128, 96)
    assert px.shape == (2, 96, 128)
    single, _ = r.render(m, 128, 96)
    np.testing.assert_array_equal(np.asarray(px[0]), single)


def _replicate_textures(scene, n):
    import dataclasses
    from swift3drenderer_tpu.models.textures import default_texture_words
    reps = np.concatenate([default_texture_words(2)] * (n // 2))
    big = dataclasses.replace(scene, textures=reps)
    # Spread the textured attributes across ALL n textures so the kernel's
    # per-texture fetch partitioning is actually exercised.
    tex = big.attr_tex.copy()
    textured = np.nonzero(tex >= 0)[0]
    tri_tex = big.attribute_indices.reshape(-1, 3)
    for t, corners in enumerate(tri_tex):
        for a in corners:
            if tex[a] >= 0:
                tex[a] = t % n
    big.attr_tex = tex
    big.validate()
    return big


def test_pallas_many_textures_in_kernel():
    # 32 textures fit the probed 96 MB VMEM atlas budget: the pallas kernel
    # renders them directly (round 1 fell off a 7x perf cliff past 12).
    scene = _replicate_textures(icosahedron_scene(seed=0), 32)
    m = identity_camera()
    gp, _ = golden_render(scene, m, 128, 96)
    px, _ = Renderer(scene, backend="pallas").render(m, 128, 96)
    assert pixel_mismatch_fraction(gp, px, tol=1) < 0.003


def test_pallas_many_textures_pages(monkeypatch):
    # Scenes whose textures exceed the kernel's VMEM atlas budget render via
    # the texture-paged pallas multipass: one pass per atlas page, merged by
    # (depth, global slot id). 14 textures at a 6-texture page size = 3 pages.
    import swift3drenderer_tpu.ops.raster_pallas as rp
    monkeypatch.setattr(rp, "MAX_ATLAS_TEXTURES", 6)
    scene = _replicate_textures(icosahedron_scene(seed=0), 14)
    m = identity_camera()
    gp, _ = golden_render(scene, m, 128, 96)
    px, _ = Renderer(scene, backend="pallas").render(m, 128, 96)
    assert pixel_mismatch_fraction(gp, px, tol=1) < 0.003


def test_pallas_texture_pages_with_slot_chunks(monkeypatch):
    # Texture paging composes with the slot-chunk multipass: pages x chunks
    # passes, still pixel-exact vs golden (the (depth, min gid) merge is
    # split-invariant). Also covers the batch path (B=2 camera batch).
    import swift3drenderer_tpu.ops.raster_pallas as rp
    monkeypatch.setattr(rp, "MAX_ATLAS_TEXTURES", 6)
    monkeypatch.setattr(rp, "MAX_SLOTS_PER_PASS_B1", 16)
    monkeypatch.setattr(rp, "MAX_SLOTS_PER_PASS", 16)
    scene = _replicate_textures(icosahedron_scene(seed=0), 14)
    m = identity_camera()
    # 160x96 (not the page test's 128x96): same shapes would hit the page
    # test's jit cache, compiled before the slot caps were patched down.
    gp, _ = golden_render(scene, m, 160, 96)
    r = Renderer(scene, backend="pallas")
    px, _ = r.render(m, 160, 96)
    assert pixel_mismatch_fraction(gp, px, tol=1) < 0.003
    ms = np.stack([m, m])
    bpx, _ = r.render_batch(ms, 160, 96)
    np.testing.assert_array_equal(np.asarray(bpx[0]), np.asarray(px))
    np.testing.assert_array_equal(np.asarray(bpx[1]), np.asarray(px))


def test_pallas_multi_pass_untextured_scene():
    # Multi-pass + zero textures (dummy atlas path) is a distinct combination.
    # cap_override forces real multipass (a single frame's cap is 4096, which
    # 2240 slots would fit in one pass).
    from swift3drenderer_tpu.models.primitives import SceneBuilder, add_tetrahedron
    from swift3drenderer_tpu.models.scene import _finish
    from swift3drenderer_tpu.ops.raster_pallas import rasterize_pallas
    rng = np.random.default_rng(7)
    b = SceneBuilder()
    for i in range(280):  # 1120 triangles -> 2240 slots -> 3 passes at cap 1024
        add_tetrahedron(b, rng, r=1.0,
                        p=(-20.0 + (i % 24) * 1.8, (i // 24) % 5 * 2.0,
                           -6.0 - (i // 120) * 4.0))
    scene = _finish(b, None, 0)
    assert scene.num_textures == 0
    assert 2 * scene.num_triangles > 2 * 1024
    dev = scene_to_device(scene)
    m = jnp.asarray(identity_camera(), jnp.float32)
    setup = build_setup(dev, m, width=160, height=96, config=DEFAULT_CONFIG)
    px, _ = rasterize_pallas(
        setup, dev["textures"], width=160, height=96,
        background=DEFAULT_CONFIG.background_packed, interpret=True,
        cap_override=1024)
    gp, _ = golden_render(scene, identity_camera(), 160, 96)
    assert pixel_mismatch_fraction(gp, np.asarray(px), tol=1) < 0.004
