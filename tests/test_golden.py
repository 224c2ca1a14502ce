"""Golden CPU renderer stage tests: edge function, near-plane clip cases, and
whole-frame sanity on the benchmark scenes."""

import numpy as np

from swift3drenderer_tpu.camera import Camera, Input
from swift3drenderer_tpu.config import DEFAULT_CONFIG
from swift3drenderer_tpu.golden.renderer import (
    TriJob,
    clip_near,
    edge_function,
    project,
    render_frame,
)
from swift3drenderer_tpu.models import (
    clipping_scene,
    default_scene,
    tetrahedron_scene,
)

f32 = np.float32


def test_edge_function_signed_area():
    a = np.array([0.0, 0.0, 0.0], f32)
    b = np.array([4.0, 0.0, 0.0], f32)
    c = np.array([0.0, 3.0, 0.0], f32)
    # (c.x-a.x)(a.y-b.y) + (c.y-a.y)(b.x-a.x) = 2 * area for CCW-in-screen order.
    assert edge_function(a, b, c) == 12.0
    assert edge_function(b, a, c) == -12.0
    # Collinear -> 0.
    assert edge_function(a, b, np.array([2.0, 0.0, 0.0], f32)) == 0.0


def _make_job(cvs, tex=-1):
    cfg = DEFAULT_CONFIG
    cv = np.asarray(cvs, f32)
    factor = f32(cfg.factor(480))
    rv = project(cv, factor, f32(320.0), f32(240.0))
    attr = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], f32)
    n = np.tile(np.array([0.0, 0.0, 1.0], f32), (3, 1))
    return TriJob(cv=cv, rv=rv, attr=attr, n=n, tex=tex), factor


def test_clip_one_vertex_in_front_shrinks():
    # Camera looks along -z; view depth rv.z = -cv.z. Corner 0 in front
    # (z = -1 -> depth 1), corners 1, 2 behind the near plane.
    job, factor = _make_job([[0, 0, -1.0], [1, 0, 0.05], [-1, 0, 0.05]])
    primary, appended = clip_near(job, f32(0.1), factor, f32(320), f32(240))
    assert appended is None
    near = 0.1
    # Crossing points sit exactly at depth == near (render.swift:189).
    depths = sorted(primary.rv[:, 2].tolist())
    assert abs(depths[0] - near) < 1e-6 and abs(depths[1] - near) < 1e-6
    assert abs(depths[2] - 1.0) < 1e-6
    # The surviving original corner keeps its data.
    kept = primary.rv[:, 2].argmax()
    np.testing.assert_allclose(primary.cv[kept], job.cv[0], atol=1e-6)


def test_clip_two_vertices_in_front_splits():
    job, factor = _make_job([[0, 0, -1.0], [1, 0, -1.0], [0, 1, 0.05]])
    primary, appended = clip_near(job, f32(0.1), factor, f32(320), f32(240))
    assert appended is not None
    # Primary keeps the two front corners; both triangles contain crossing points
    # at depth near.
    assert (np.abs(primary.rv[:, 2] - 0.1) < 1e-6).sum() == 1
    assert (np.abs(appended.rv[:, 2] - 0.1) < 1e-6).sum() == 2
    # Interpolation parameter: a = (near - z_i) / (z_next - z_i); color lerped.
    for tri in (primary, appended):
        assert np.all(tri.rv[:, 2] >= 0.1 - 1e-6)


def test_clip_winding_preserved():
    # A front-facing (positive screen area) triangle must stay positive after both
    # clip modes, else it would be wrongly backface-culled downstream. Note screen
    # y points down (rv.y = -cv.y), so this order is front-facing.
    job, factor = _make_job([[1, 0, -2.0], [0, 0, -2.0], [0.5, 1, 0.05]])
    primary, appended = clip_near(job, f32(0.1), factor, f32(320), f32(240))
    assert appended is not None
    assert edge_function(primary.rv[0], primary.rv[1], primary.rv[2]) > 0
    assert edge_function(appended.rv[0], appended.rv[1], appended.rv[2]) > 0
    # Shrink case: one vertex in front.
    job2, factor = _make_job([[0.5, 1, -2.0], [0, 0, 0.05], [1, 0, 0.05]])
    primary2, appended2 = clip_near(job2, f32(0.1), factor, f32(320), f32(240))
    assert appended2 is None
    assert edge_function(primary2.rv[0], primary2.rv[1], primary2.rv[2]) > 0


def test_render_tetrahedron_smoke():
    scene = tetrahedron_scene(seed=0)
    cam = Camera()
    m = cam.update(Input(), force_update=True)
    pixels, depth = render_frame(scene, m, 320, 240)
    bg = DEFAULT_CONFIG.background_packed
    covered = (pixels != bg).sum()
    assert covered > 500  # the tetrahedron at (0, 0, -6) is clearly visible
    assert (depth > 0).sum() == covered
    # Depth stores 1/z: all finite values below 1/near.
    assert depth.max() < 1.0 / DEFAULT_CONFIG.near + 1e-3


def test_render_default_scene_smoke():
    scene = default_scene(seed=0)
    cam = Camera()
    m = cam.update(Input(), force_update=True)
    pixels, _ = render_frame(scene, m, 320, 240)
    bg = DEFAULT_CONFIG.background_packed
    # The floor (z in [-32, -2], y = -0.5) fills rows between the horizon (~120)
    # and its near-edge projection (~row 212 at 320x240).
    floor_band = pixels[150:210, :]
    assert (floor_band != bg).mean() > 0.95
    # Objects above the horizon are visible too.
    assert (pixels[:120, :] != bg).mean() > 0.02


def test_render_deterministic():
    scene = tetrahedron_scene(seed=0)
    m = Camera().update(Input(), force_update=True)
    a, _ = render_frame(scene, m, 160, 120)
    b, _ = render_frame(scene, m, 160, 120)
    np.testing.assert_array_equal(a, b)


def test_clipping_scene_split_does_not_crash():
    # Fly the camera through geometry so triangles straddle the near plane.
    scene = clipping_scene(seed=0)
    cam = Camera()
    pixels = None
    for step in range(30):
        m = cam.update(Input(up=1.0), force_update=(step == 0))
        pixels, _ = render_frame(scene, m, 160, 120)
    assert pixels is not None


def test_backface_and_small_area_culled():
    scene = tetrahedron_scene(seed=0)
    m = Camera().update(Input(), force_update=True)
    # At 2x2 resolution every triangle projects below the area-10 cull; frame
    # must be pure background.
    pixels, _ = render_frame(scene, m, 2, 2)
    assert np.all(pixels == DEFAULT_CONFIG.background_packed)


def test_clip_prepass_matches_golden_on_random_triangles():
    # Property test of the subtlest stage: the vectorized fixed-shape clip
    # prepass must reproduce golden clip_near over random straddling triangles
    # (all three cases: 0/1/2 vertices in front).
    import jax.numpy as jnp
    from swift3drenderer_tpu.ops.clip import clip_prepass

    rng = np.random.default_rng(42)
    cfg = DEFAULT_CONFIG
    factor = f32(cfg.factor(480))
    near = f32(cfg.near)
    n_cases = {0: 0, 1: 0, 2: 0, 3: 0}
    for trial in range(400):
        cv = rng.uniform(-3, 3, size=(3, 3)).astype(f32)
        # depth = -z in [-0.3, 1]: straddles the near plane (0.1) often and
        # produces a healthy share of fully-behind triangles too
        cv[:, 2] = rng.uniform(-1, 0.3, size=3)
        rv = project(cv, factor, f32(320), f32(240))
        attr = rng.uniform(0, 255, size=(3, 3)).astype(f32)
        nrm = rng.standard_normal((3, 3)).astype(f32)
        job = TriJob(cv=cv, rv=rv, attr=attr, n=nrm, tex=-1)
        nfront = int((rv[:, 2] > near).sum())
        n_cases[nfront] += 1

        out = clip_prepass(
            jnp.asarray(cv[None]), jnp.asarray(rv[None]), jnp.asarray(attr[None]),
            jnp.asarray(nrm[None]), jnp.asarray(np.array([-1])),
            float(near), float(factor), 320.0, 240.0)
        valid = np.asarray(out["valid"])
        if nfront == 0:
            assert not valid.any(), trial
            continue
        if nfront == 3:
            assert valid[0] and not valid[1]
            np.testing.assert_array_equal(np.asarray(out["rv"][0]), rv)
            continue
        primary, appended = clip_near(job, near, factor, f32(320), f32(240))
        assert valid[0]
        np.testing.assert_allclose(np.asarray(out["rv"][0]), primary.rv,
                                   rtol=1e-5, atol=1e-3, err_msg=str(trial))
        np.testing.assert_allclose(np.asarray(out["cv"][0]), primary.cv,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["attr"][0]), primary.attr,
                                   rtol=1e-5, atol=1e-3)
        if appended is None:
            assert not valid[1], trial
        else:
            assert valid[1], trial
            np.testing.assert_allclose(np.asarray(out["rv"][1]), appended.rv,
                                       rtol=1e-5, atol=1e-3)
    # The random distribution must actually exercise every case.
    assert min(n_cases.values()) >= 5, n_cases
