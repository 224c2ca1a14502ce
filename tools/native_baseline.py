"""Measure the framework's native C++ core at the five BASELINE.json configs.

Mirrors tools/cpu_baseline/run_baseline.py config-for-config and pose-for-pose:
the reference harness (tools/cpu_baseline/harness.cpp) warms one zero-input
frame, then flies with up=2.0 and an accumulating mouse.x (+1.0/frame); this
driver feeds NativeCamera the identical input stream so frame N renders the
same pose in both. Prints a BASELINE.md-style table with same-machine ratios
against tools/cpu_baseline/results.json (the reference C++ -O2 core,
/root/reference/render-cpp/render.cpp:265-384 driven headless).

Run from the repo root:

    python tools/native_baseline.py [--frames-scale S]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from swift3drenderer_tpu.models import SCENES  # noqa: E402
from swift3drenderer_tpu.native import NativeCamera, NativeRenderer  # noqa: E402

# (name, scene, width, height, fly, frames) — identical to run_baseline.py.
CONFIGS = [
    ("tetrahedron-640x480", "tetrahedron", 640, 480, False, 60),
    ("icosahedron-1920x1080-fly", "icosahedron", 1920, 1080, True, 30),
    ("anisotropic-1920x1080", "anisotropic", 1920, 1080, False, 30),
    ("clipping-1920x1080-fly", "clipping", 1920, 1080, True, 30),
    ("full-3840x2160", "default", 3840, 2160, False, 15),
    ("full-1920x1080", "default", 1920, 1080, False, 30),
]


def run_config(scene_name: str, w: int, h: int, fly: bool, frames: int) -> dict:
    scene = SCENES[scene_name](seed=0)
    r = NativeRenderer(scene)
    cam = NativeCamera()
    mouse_x = 0.0
    m = cam.update(force_update=True)
    r.render(m, w, h)  # warm frame, zero input (harness.cpp:69)
    t0 = time.perf_counter()
    for _ in range(frames):
        if fly:
            mouse_x += 1.0
            m = cam.update(up=2.0, mouse=(mouse_x, 0.0))
        else:
            m = cam.update()
        pixels, _ = r.render(m, w, h)
    dt = (time.perf_counter() - t0) / frames
    checksum = int(pixels.astype("uint64").sum())
    return {
        "width": w, "height": h, "frames": frames,
        "ms_per_frame": round(dt * 1e3, 4), "fps": round(1.0 / dt, 3),
        "checksum": checksum, "triangles": scene.num_triangles,
        "Mpix_per_s": round(w * h / dt / 1e6, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-scale", type=int, default=4,
                    help="multiply per-config frame counts (native core is fast; "
                         "more frames stabilize the timing)")
    args = ap.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    ref_path = os.path.join(here, "cpu_baseline", "results.json")
    ref = {}
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)

    results = {}
    print(f"{'config':28s} {'ms/frame':>9s} {'fps':>9s} {'Mpix/s':>8s} {'vs ref C++':>10s}")
    for name, scene_name, w, h, fly, frames in CONFIGS:
        res = run_config(scene_name, w, h, fly, frames * args.frames_scale)
        ratio = res["fps"] / ref[name]["fps"] if name in ref else float("nan")
        res["vs_reference"] = round(ratio, 2)
        results[name] = res
        print(f"{name:28s} {res['ms_per_frame']:9.2f} {res['fps']:9.2f} "
              f"{res['Mpix_per_s']:8.1f} {ratio:9.2f}x")

    out_path = os.path.join(here, "native_baseline_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
