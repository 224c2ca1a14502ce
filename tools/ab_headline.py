"""On-chip A/B sweep of headline-config kernel variants.

Runs `python bench.py` (the driver's exact protocol) in a fresh subprocess per
variant — the S3D_* knobs bind at module import, so each variant needs its own
interpreter — and prints a ranked table. Repeats each variant R times
round-robin so tunnel-latency phases average out across variants rather than
biasing whichever ran last.

    python tools/ab_headline.py [--reps 3] [--frames 20]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

VARIANTS = [
    # (name, env overrides, extra bench args)
    ("default(128)", {}, []),
    # Round-4 row-constant single-gather fetch path off (it is on by default;
    # the pair isolates its contribution at the shipped config).
    ("rowconst-off", {"S3D_ROWCONST": "0"}, []),
    # NB: the default 16-row strips don't divide 120; the nearest-divisor
    # legalization rounds them to 24 there (ties prefer larger) — the sph24
    # and sph8 variants below pin their strip heights EXPLICITLY so each
    # label matches the config that actually runs.
    ("tile120/sph24", {"S3D_NEAREST_STRIP_H": "24", "S3D_FETCH_STRIP_H": "24"},
     ["--tile-h", "120"]),
    ("seg128", {"S3D_FORCE_SEGMENTED": "1"}, []),
    ("seg120/sph24", {"S3D_FORCE_SEGMENTED": "1", "S3D_NEAREST_STRIP_H": "24",
                      "S3D_FETCH_STRIP_H": "24"}, ["--tile-h", "120"]),
    ("tile64", {}, ["--tile-h", "64"]),
    # 1080 = 9x120 = 5x216 exactly (zero padded rows vs 6.7% at 128); 144
    # keeps the proven 16-row strips while cutting grid steps 135 -> 120.
    ("tile144/sph16", {}, ["--tile-h", "144"]),
    ("tile120/sph8", {"S3D_NEAREST_STRIP_H": "8", "S3D_FETCH_STRIP_H": "8"},
     ["--tile-h", "120"]),
    ("tile216/sph24", {"S3D_NEAREST_STRIP_H": "24", "S3D_FETCH_STRIP_H": "24"},
     ["--tile-h", "216"]),
]


def run_once(env_over: dict, extra: list[str], frames: int) -> dict:
    env = dict(os.environ, **env_over)
    cmd = [sys.executable, "bench.py", "--frames", str(frames)] + extra
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=os.path.join(os.path.dirname(__file__), ".."))
    if out.returncode != 0:
        raise RuntimeError(f"{cmd} failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset of variant names")
    args = ap.parse_args()

    chosen = VARIANTS
    if args.variants:
        names = set(args.variants.split(","))
        chosen = [v for v in VARIANTS if v[0] in names]

    results: dict[str, list[float]] = {v[0]: [] for v in chosen}
    for rep in range(args.reps):
        for name, env_over, extra in chosen:
            r = run_once(env_over, extra, args.frames)
            ms = r["extra"]["frame_ms"]
            results[name].append(ms)
            print(f"rep {rep}: {name:14s} {ms:7.3f} ms  "
                  f"({r['value']:.0f} fps, {r['vs_baseline']}x)", flush=True)

    print("\nvariant          best      median")
    for name, samples in sorted(results.items(), key=lambda kv: min(kv[1])):
        print(f"{name:14s} {min(samples):7.3f} {statistics.median(samples):9.3f}")


if __name__ == "__main__":
    main()
