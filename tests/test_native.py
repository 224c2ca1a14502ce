"""Native runtime tests: the C++ CPU core as a behavioral twin of the golden
oracle (the same dual-implementation cross-check the reference maintains between
its Swift and C++ cores, reference README.md:17)."""

import os
import subprocess

import numpy as np
import pytest

from swift3drenderer_tpu.camera import Camera, Input
from swift3drenderer_tpu.config import DEFAULT_CONFIG
from swift3drenderer_tpu.golden import render_frame as golden_render
from swift3drenderer_tpu.models import clipping_scene, default_scene, tetrahedron_scene
from swift3drenderer_tpu.utils.databin import dump_scene

from conftest import pixel_mismatch_fraction

native = pytest.importorskip("swift3drenderer_tpu.native")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session", autouse=True)
def native_built(build_native):
    # The build itself runs once in conftest (before ANY module — test_app's
    # fallback test needs the library too); on machines without the C
    # toolchain the whole module skips instead of failing.
    if not native.native_available():
        pytest.skip("native library not built (no C toolchain?)")


def identity_camera():
    return Camera().update(Input(), force_update=True)


def test_native_matches_golden_default_scene():
    scene = default_scene(seed=0)
    m = identity_camera()
    gp, gd = golden_render(scene, m, 320, 240)
    nr = native.NativeRenderer(scene)
    px, d = nr.render(m, 320, 240)
    frac = pixel_mismatch_fraction(gp, px, tol=1)
    assert frac < 0.002, frac
    both = (gd > 0) & (d > 0)
    np.testing.assert_allclose(d[both], gd[both], rtol=1e-4)


def test_native_clipping_flight():
    scene = clipping_scene(seed=0)
    cam = Camera()
    nr = native.NativeRenderer(scene)
    for step in range(10):
        m = cam.update(Input(up=2.0), force_update=(step == 0))
        gp, _ = golden_render(scene, m, 160, 120)
        px, _ = nr.render(m, 160, 120)
        assert pixel_mismatch_fraction(gp, px, tol=1) < 0.004, step


def test_native_bilinear():
    import dataclasses
    cfg = dataclasses.replace(DEFAULT_CONFIG, sampling="bilinear")
    scene = default_scene(seed=0)
    m = identity_camera()
    gp, _ = golden_render(scene, m, 160, 120, config=cfg)
    px, _ = native.NativeRenderer(scene, config=cfg).render(m, 160, 120)
    assert pixel_mismatch_fraction(gp, px, tol=1) < 0.003


def test_native_scene_io_roundtrip(tmp_path):
    scene = default_scene(seed=0)
    path = str(tmp_path / "data.bin")
    dump_scene(scene, path)
    lib = native.load_native()
    handle = native.load_scene_native(path)
    assert lib.s3d_scene_vertex_count(handle) == 39
    assert lib.s3d_scene_triangle_count(handle) == 51
    assert lib.s3d_scene_texture_count(handle) == 2
    # Save through native, reload through Python: byte-identical.
    out = str(tmp_path / "resaved.bin")
    assert lib.s3d_scene_save(handle, out.encode()) == 0
    assert open(out, "rb").read() == open(path, "rb").read()
    lib.s3d_scene_free(handle)


def test_native_rejects_corrupt_scene(tmp_path):
    scene = default_scene(seed=0)
    blob = bytearray(dump_scene(scene))
    off = 16 + 39 * 16 + 16 + 154 * 8 + 16  # first attribute record
    blob[off + 32] = 0  # flip texture attr to color -> mixed triangle
    path = str(tmp_path / "bad.bin")
    open(path, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="mixes color and texture"):
        native.load_scene_native(path)
    with pytest.raises(ValueError, match="truncated"):
        path2 = str(tmp_path / "short.bin")
        open(path2, "wb").write(bytes(blob[:40]))
        native.load_scene_native(path2)
    # Regression: a tiny file claiming a huge vertex count must be rejected
    # up front (count validated against remaining bytes), not attempt a
    # multi-GB allocation.
    path3 = str(tmp_path / "hugecount.bin")
    import struct
    open(path3, "wb").write(struct.pack("<qq", 1 << 40, 0))
    with pytest.raises(ValueError, match="truncated"):
        native.load_scene_native(path3)


def test_native_camera_twin():
    cam_py = Camera()
    cam_nat = native.NativeCamera()
    for step in range(5):
        inp = Input(up=1.0, right=0.5, mouse=(3.0 * step, -step))
        m_py = cam_py.update(inp, force_update=(step == 0))
        m_nat = cam_nat.update(up=1.0, right=0.5, mouse=(3.0 * step, -step),
                               force_update=(step == 0))
        np.testing.assert_allclose(m_nat, m_py, atol=1e-5)


def test_native_perf_sanity():
    # The native core should comfortably beat the NumPy oracle.
    import time
    scene = tetrahedron_scene(seed=0)
    m = identity_camera()
    nr = native.NativeRenderer(scene)
    nr.render(m, 640, 480)
    t0 = time.perf_counter()
    for _ in range(5):
        nr.render(m, 640, 480)
    native_t = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    golden_render(scene, m, 640, 480)
    golden_t = time.perf_counter() - t0
    assert native_t < golden_t


def test_renderer_native_backend():
    from swift3drenderer_tpu.renderer import Renderer
    scene = tetrahedron_scene(seed=0)
    m = identity_camera()
    r = Renderer(scene, backend="native")
    px, d = r.render(m, 160, 120)
    gp, _ = golden_render(scene, m, 160, 120)
    assert pixel_mismatch_fraction(gp, px, tol=1) < 0.002
    with pytest.raises(ValueError, match="native backend renders on host"):
        r.render_device(m, 160, 120)


@pytest.mark.quick
def test_simd_matches_scalar_path():
    """The AVX-512 visibility path must be bit-identical to the scalar loops
    (same op order by construction); the shade path may differ by <=1 LSB.
    S3D_NATIVE_SIMD binds at library load, so compare across subprocesses."""
    import sys
    code = (
        "import numpy as np, sys\n"
        "from swift3drenderer_tpu.models import default_scene, clipping_scene\n"
        "from swift3drenderer_tpu.camera import Camera, Input\n"
        "from swift3drenderer_tpu.native import NativeRenderer\n"
        "from swift3drenderer_tpu.config import RenderConfig\n"
        "out = {}\n"
        "for name, scene in [('default', default_scene(seed=0)),\n"
        "                    ('clipping', clipping_scene(seed=0))]:\n"
        "    for sampling in ('nearest', 'bilinear'):\n"
        "        r = NativeRenderer(scene, config=RenderConfig(sampling=sampling))\n"
        "        cam = Camera()\n"
        "        m = np.asarray(cam.update(Input(), force_update=True), np.float32)\n"
        "        for _ in range(3):\n"
        "            m = np.asarray(cam.update(Input(up=1.0, mouse=(20.0, 8.0))), np.float32)\n"
        "        px, d = r.render(m, 192, 144)\n"
        "        out[f'{name}-{sampling}-px'] = px\n"
        "        out[f'{name}-{sampling}-d'] = d\n"
        "np.savez(sys.argv[1], **out)\n"
    )
    outs = {}
    for knob in ("0", "1"):
        path = os.path.join(os.environ.get("TMPDIR", "/tmp"),
                            f"s3d_simd_{knob}_{os.getpid()}.npz")
        env = dict(os.environ, S3D_NATIVE_SIMD=knob)
        subprocess.run([sys.executable, "-c", code, path], env=env, check=True,
                       capture_output=True, cwd=REPO)
        outs[knob] = dict(np.load(path))
        os.remove(path)
    for key, scalar in outs["0"].items():
        simd = outs["1"][key]
        if key.endswith("-d"):
            # depth comes from the visibility resolve: bit-exact by design
            np.testing.assert_array_equal(scalar, simd, err_msg=key)
        else:
            db = np.abs(scalar.astype(np.int64).reshape(-1, 1).view(np.uint8)[:, :4].astype(np.int16)
                        - simd.astype(np.int64).reshape(-1, 1).view(np.uint8)[:, :4].astype(np.int16))
            assert db.max() <= 1, (key, db.max())


@pytest.mark.quick
def test_native_baseline_run_config():
    """tools/native_baseline.py drives NativeRenderer/NativeCamera pose-for-pose
    with the reference harness flight (tools/cpu_baseline/harness.cpp:73-76);
    smoke the driver at a tiny size so API drift fails fast."""
    import importlib.util
    path = os.path.join(REPO, "tools", "native_baseline.py")
    spec = importlib.util.spec_from_file_location("native_baseline", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    r = mod.run_config("tetrahedron", 160, 120, fly=True, frames=3)
    assert r["frames"] == 3 and r["fps"] > 0 and r["checksum"] > 0
    assert r["triangles"] == 4
