"""Golden-frame differential tests: JAX/XLA renderer vs the NumPy golden oracle,
over the BASELINE.json config families (SURVEY.md section 4)."""

import numpy as np
import pytest

from swift3drenderer_tpu.camera import Camera, Input
from swift3drenderer_tpu.config import DEFAULT_CONFIG
from swift3drenderer_tpu.golden import render_frame as golden_render
from swift3drenderer_tpu.models import (
    anisotropic_scene,
    clipping_scene,
    default_scene,
    icosahedron_scene,
    tetrahedron_scene,
)
from swift3drenderer_tpu.renderer import Renderer

from conftest import pixel_mismatch_fraction


def identity_camera():
    return Camera().update(Input(), force_update=True)


def compare(scene, m, w, h, max_mismatch=0.002, renderer=None):
    golden_px, golden_depth = golden_render(scene, m, w, h)
    r = renderer or Renderer(scene)
    px, depth = r.render(m, w, h)
    frac = pixel_mismatch_fraction(golden_px, px, tol=1)
    assert frac <= max_mismatch, f"pixel mismatch fraction {frac}"
    # Depth agreement away from triangle edges: compare where both agree on
    # coverage.
    both = (golden_depth > 0) & (depth > 0)
    if both.any():
        np.testing.assert_allclose(depth[both], golden_depth[both], rtol=2e-3)
    return px


def test_tetrahedron_fixed_camera():
    # BASELINE config 1: flat-colored tetrahedron, fixed camera, 640x480.
    scene = tetrahedron_scene(seed=0)
    px = compare(scene, identity_camera(), 640, 480)
    assert (px != DEFAULT_CONFIG.background_packed).sum() > 2000


def test_icosahedron_textured():
    # BASELINE config 2 (fixed camera slice of the fly-through).
    scene = icosahedron_scene(seed=0)
    compare(scene, identity_camera(), 320, 240)


def test_anisotropic_floor():
    # BASELINE config 3: shallow-angle textures exercise the ripmap level path.
    scene = anisotropic_scene()
    compare(scene, identity_camera(), 320, 240)


def test_full_scene():
    scene = default_scene(seed=0)
    compare(scene, identity_camera(), 320, 240)


def test_fly_through_with_clipping():
    # BASELINE config 4: camera flies into/through geometry (near-plane splits).
    scene = clipping_scene(seed=0)
    cam = Camera()
    r = Renderer(scene)
    for step in range(12):
        m = cam.update(Input(up=2.0), force_update=(step == 0))
        compare(scene, m, 160, 120, max_mismatch=0.004, renderer=r)


def test_mouse_rotated_camera():
    scene = default_scene(seed=0)
    cam = Camera()
    cam.update(Input(), force_update=True)
    m = cam.update(Input(mouse=(40.0, -25.0)))
    compare(scene, m, 320, 240)


def test_odd_resolution_and_band_remainder():
    # Height not a multiple of the band size; width not lane-aligned.
    scene = tetrahedron_scene(seed=0)
    compare(scene, identity_camera(), 123, 97)


def test_depth_is_one_over_z():
    scene = tetrahedron_scene(seed=0)
    px, depth = Renderer(scene).render(identity_camera(), 320, 240)
    covered = depth > 0
    assert covered.any()
    assert depth[covered].max() < 1.0 / DEFAULT_CONFIG.near


def test_regular_floor_scene():
    from swift3drenderer_tpu.models import regular_floor_scene
    scene = regular_floor_scene(seed=0, size=8)  # 2*64 floor tris + 48 polyhedra
    assert scene.num_triangles == 2 * 64 + 48
    compare(scene, identity_camera(), 160, 120, max_mismatch=0.004)


def test_single_device_camera_batch():
    scene = tetrahedron_scene(seed=0)
    cam = Camera()
    ms = np.stack([cam.update(Input(right=1.0), force_update=(i == 0)).copy()
                   for i in range(3)])
    r = Renderer(scene)
    px, depth = r.render_batch(ms, 128, 96)
    assert px.shape == (3, 96, 128)
    for b in range(3):
        single, _ = r.render(ms[b], 128, 96)
        np.testing.assert_array_equal(np.asarray(px[b]), single)


def test_scene_animation_update():
    # update_scene swaps geometry without recompilation (same shapes).
    scene = tetrahedron_scene(seed=0)
    r = Renderer(scene)
    m = identity_camera()
    before, _ = r.render(m, 128, 96)
    moved = scene.vertices.copy()
    moved[:, 0] += 2.0  # slide the tetrahedron right
    r.update_scene(vertices=moved)
    after, _ = r.render(m, 128, 96)
    assert not np.array_equal(before, after)
    # Equivalent to building a fresh renderer on the moved scene.
    import dataclasses
    fresh, _ = Renderer(dataclasses.replace(scene, vertices=moved)).render(m, 128, 96)
    np.testing.assert_array_equal(after, fresh)
    with pytest.raises(ValueError, match="shape"):
        r.update_scene(vertices=moved[:2])
