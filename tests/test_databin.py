"""data.bin format tests: byte layout (48 B attribute stride, 16 B section framing)
and generator -> loader round trips (SURVEY.md section 4)."""

import io
import struct

import numpy as np
import pytest

from swift3drenderer_tpu.models import default_scene, tetrahedron_scene
from swift3drenderer_tpu.utils.databin import (
    ATTR_RECORD_SIZE,
    TEXTURE_WORDS,
    Scene,
    dump_scene,
    load_scene,
)


def test_default_scene_counts():
    # Reference default scene: 39 vertices, 51 triangles, 153 attributes, 2 textures
    # (SURVEY.md section 2; data-generator/main.swift:375-379).
    s = default_scene(seed=0)
    assert s.num_vertices == 39
    assert s.num_triangles == 51
    assert s.vertex_indices.shape[0] == 153
    assert s.num_attributes == 153
    assert s.num_textures == 2


def test_default_scene_deterministic():
    a = default_scene(seed=7)
    b = default_scene(seed=7)
    np.testing.assert_array_equal(a.vertices, b.vertices)
    c = default_scene(seed=8)
    assert not np.array_equal(a.vertices, c.vertices)


def test_roundtrip():
    s = default_scene(seed=0)
    blob = dump_scene(s)
    s2 = load_scene(blob)
    np.testing.assert_array_equal(s.vertices, s2.vertices)
    np.testing.assert_array_equal(s.vertex_indices, s2.vertex_indices)
    np.testing.assert_array_equal(s.normals, s2.normals)
    np.testing.assert_array_equal(s.attr_vec, s2.attr_vec)
    np.testing.assert_array_equal(s.attr_tex, s2.attr_tex)
    np.testing.assert_array_equal(s.attribute_indices, s2.attribute_indices)
    np.testing.assert_array_equal(s.textures, s2.textures)
    # Round-trip of the serialized bytes themselves.
    assert dump_scene(s2) == blob


def test_byte_layout():
    s = default_scene(seed=0)
    blob = dump_scene(s)
    f = io.BytesIO(blob)
    vcount, zero = struct.unpack("<qq", f.read(16))
    assert (vcount, zero) == (39, 0)
    verts = np.frombuffer(f.read(vcount * 16), dtype="<f4").reshape(vcount, 4)
    assert np.all(verts[:, 3] == 1.0)  # w written as 1 (gen main.swift:388)

    vicount, _ = struct.unpack("<qq", f.read(16))
    assert vicount == 153
    f.read((vicount + vicount % 2) * 8)  # padded to 16 B

    acount, _ = struct.unpack("<qq", f.read(16))
    assert acount == 153
    rec = f.read(ATTR_RECORD_SIZE)
    assert len(rec) == 48
    # First attribute of the default scene is the floor texture attr: tag 1,
    # texture index 0.
    assert rec[32] == 1
    assert struct.unpack("<q", rec[16:24])[0] == 0
    assert rec[33:48] == b"\x00" * 15  # reference writes 15 zero pad bytes
    f.read((acount - 1) * ATTR_RECORD_SIZE)

    aicount, _ = struct.unpack("<qq", f.read(16))
    assert aicount == 153
    f.read((aicount + aicount % 2) * 8)

    wcount, _ = struct.unpack("<qq", f.read(16))
    assert wcount == 2 * TEXTURE_WORDS  # count written as num_textures << 18
    rest = f.read()
    assert len(rest) == wcount * 4
    assert f.read() == b""


def test_color_attribute_layout():
    s = tetrahedron_scene(seed=0)
    blob = dump_scene(s)
    s2 = load_scene(blob)
    assert np.all(s2.attr_tex == -1)
    np.testing.assert_array_equal(s.attr_vec, s2.attr_vec)


def test_validate_rejects_mixed_triangle():
    s = default_scene(seed=0)
    # Corrupt: make one corner of a textured triangle a color attribute.
    s.attr_tex = s.attr_tex.copy()
    s.attr_tex[s.attribute_indices[0]] = -1
    with pytest.raises(ValueError, match="mix color and texture"):
        s.validate()


def test_validate_rejects_bad_index():
    s = tetrahedron_scene(seed=0)
    s.vertex_indices = s.vertex_indices.copy()
    s.vertex_indices[0] = 999
    with pytest.raises(ValueError, match="vertex index out of range"):
        s.validate()


def test_datagen_entropy_seed(tmp_path):
    # --seed none = the reference generator's unseeded Float.random behavior
    # (data-generator/main.swift:13-32): two runs differ, layout stays valid.
    from swift3drenderer_tpu.datagen import main as datagen_main
    p1, p2 = str(tmp_path / "e1.bin"), str(tmp_path / "e2.bin")
    datagen_main(["--scene", "default", "--seed", "none", "--out", p1])
    datagen_main(["--scene", "default", "--seed", "none", "--out", p2])
    s1, s2 = load_scene(p1), load_scene(p2)
    s1.validate(), s2.validate()
    assert s1.num_triangles == s2.num_triangles == 51
    assert not np.array_equal(s1.vertices, s2.vertices)


def test_validate_rejects_textured_attrs_without_textures():
    # Regression: a zero-texture scene with textured attributes must fail
    # validation (texture index 0 is out of range), not IndexError at render.
    s = default_scene(seed=0)
    s.textures = np.zeros((0, 512, 512), np.uint32)
    with pytest.raises(ValueError, match="texture index out of range"):
        s.validate()


def test_validate_rejects_empty_scene():
    import numpy as np
    s = Scene(
        vertices=np.zeros((0, 4), np.float32),
        vertex_indices=np.zeros((0,), np.int64),
        normals=np.zeros((0, 4), np.float32),
        attr_vec=np.zeros((0, 3), np.float32),
        attr_tex=np.zeros((0,), np.int64),
        attribute_indices=np.zeros((0,), np.int64),
        textures=np.zeros((0, 512, 512), np.uint32),
    )
    with pytest.raises(ValueError, match="no triangles"):
        s.validate()
