"""bench.py is the driver's record-producing entry point — a regression here
means no benchmark record at all, so its measure() path gets CPU coverage."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


@pytest.mark.quick
@pytest.mark.parametrize("backend,tile_h", [("xla", None), ("pallas", None),
                                            ("pallas", 64)])
def test_measure_smoke(backend, tile_h):
    r = bench.measure("tetrahedron", 160, 120, frames=2, backend=backend,
                      tile_h=tile_h)
    assert r["tris"] == 4 and r["pixels"] == 160 * 120
    assert r["frame_ms"] > 0 and r["fps"] > 0


@pytest.mark.quick
def test_measure_batch():
    r = bench.measure("tetrahedron", 160, 120, frames=2, backend="pallas",
                      batch=2)
    assert r["frame_ms"] > 0
