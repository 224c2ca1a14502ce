"""On-chip probe: packed-channel quad-row texel fetch vs the 8-gather body.

The round-4 fetch idea: repack the (8, 128) i32 atlas block at upload into
per-CHANNEL quad-row words — word[j, c] packs 4 consecutive atlas rows of one
u8 channel (rows 4j..4j+3, little-endian by row) — laid out block-interleaved
as 8 rows [R0 R1 G0 G1 B0 B1 pad pad] so the kernel still issues ONE aligned
(8, 128) block load. NB the quad-word choice (row >= 4) is per OUTPUT pixel
while the lane gather indexes by LANE, so the select must come AFTER the
gathers: 2 gathers per channel = 6 per block body (vs 8), then a per-pixel
byte extract — variable shift (row & 3) * 8, or a 2-select tree if Mosaic
won't lower shift-by-vector. Unlike the row-constant fast path this applies
GENERALLY, but saves only 2 of 8 gathers plus 4 of 7 selects while adding
3 byte extracts and a 4-op repack.

Checks (on the chip):
  1. exact  — the packed bodies reproduce block[row, col] for random coords
              (both the vshift and select-tree extracts) AND vector-shift
              lowers at all;
  2. bench  — ns/iter with iteration-dependent lane indices (so the loop
              body can't be hoisted as loop-invariant), empty-subtracted.

Run: PYTHONPATH=. python tools/probe_packed_fetch.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

SPH = 16
ITERS = 200000


def pack_block(block: np.ndarray) -> np.ndarray:
    """(8, 128) i32 RGB block -> (8, 128) i32 [R0 R1 G0 G1 B0 B1 0 0]."""
    out = np.zeros_like(block)
    for ch, sh in enumerate((16, 8, 0)):
        u8 = ((block >> sh) & 0xFF).astype(np.uint32)   # (8, 128)
        for j in range(2):                              # quad-row words
            rows = u8[4 * j: 4 * j + 4]
            w = (rows[0] | (rows[1] << np.uint32(8))
                 | (rows[2] << np.uint32(16)) | (rows[3] << np.uint32(24)))
            out[2 * ch + j] = w.view(np.int32)
    return out


def make_kernel(mode: str, mix: int, iters: int):
    """mix=0: lane indices constant (correctness); mix=127: lane indices vary
    with the loop counter so the body cannot be hoisted (timing)."""

    def kernel(blk_ref, row_ref, ln_ref, out_ref):
        ROW = row_ref[:]          # (SPH, 128) in [0, 8)
        LN = ln_ref[:]            # (SPH, 128) in [0, 128)
        RB0 = (ROW & 1) != 0
        RB1 = (ROW & 2) != 0
        RB2 = (ROW & 4) != 0
        Q = (ROW & 4) != 0        # quad-word select bit (row >> 2)
        SH8 = (ROW & 3) << 3      # byte shift within the quad word

        def body_gather8(b, gp):
            ln0 = (LN + (b & mix)) & 127
            block = blk_ref[pl.ds(0, 8), pl.ds(0, 128)]
            g = [jnp.take_along_axis(
                    jnp.broadcast_to(block[r: r + 1, :], (SPH, 128)),
                    ln0, axis=1) for r in range(8)]
            s0 = [jnp.where(RB0, g[i + 1], g[i]) for i in (0, 2, 4, 6)]
            s1 = [jnp.where(RB1, s0[i + 1], s0[i]) for i in (0, 2)]
            sel = jnp.where(RB2, s1[1], s1[0])
            return gp | sel

        def body_packed(b, gp, vshift: bool):
            ln0 = (LN + (b & mix)) & 127
            block = blk_ref[pl.ds(0, 8), pl.ds(0, 128)]
            packed = jnp.zeros((SPH, 128), jnp.int32)
            for ch, sh in ((0, 16), (1, 8), (2, 0)):
                q0 = jnp.broadcast_to(block[2 * ch: 2 * ch + 1, :], (SPH, 128))
                q1 = jnp.broadcast_to(block[2 * ch + 1: 2 * ch + 2, :],
                                      (SPH, 128))
                g = jnp.where(Q, jnp.take_along_axis(q1, ln0, axis=1),
                              jnp.take_along_axis(q0, ln0, axis=1))
                if vshift:
                    byte = (g >> SH8) & 0xFF
                else:
                    b0 = jnp.where(RB0, g >> 8, g)
                    byte = jnp.where(RB1, b0 >> 16, b0) & 0xFF
                packed = packed | (byte << sh)
            return gp | packed

        body = {"gather8": body_gather8,
                "packed4": lambda b, gp: body_packed(b, gp, True),
                "packed4sel": lambda b, gp: body_packed(b, gp, False),
                "empty": lambda b, gp: gp | ((LN + (b & mix)) & 127)}[mode]
        out_ref[...] = jax.lax.fori_loop(0, iters, body,
                                         jnp.zeros((SPH, 128), jnp.int32))
    return kernel


def run(mode: str, blk, row, ln, mix: int = 0, iters: int = 1):
    return pl.pallas_call(
        make_kernel(mode, mix, iters),
        out_shape=jax.ShapeDtypeStruct((SPH, 128), jnp.int32),
    )(blk, row, ln)


def main() -> int:
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    block = rng.integers(0, 2 ** 24, (8, 128)).astype(np.int32)
    row = rng.integers(0, 8, (SPH, 128)).astype(np.int32)
    ln = rng.integers(0, 128, (SPH, 128)).astype(np.int32)
    want = block[row, ln]

    failures = 0
    for mode in ("gather8", "packed4", "packed4sel"):
        blk = block if mode == "gather8" else pack_block(block)
        try:
            got = np.asarray(run(mode, jnp.asarray(blk), jnp.asarray(row),
                                 jnp.asarray(ln)))
            ok = np.array_equal(got, want)
        except Exception as e:  # noqa: BLE001 - probe reports, not raises
            ok = False
            print(f"  {mode}: EXCEPTION {str(e)[:120]}")
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'}  exact[{mode}]")

    times = {}
    for mode in ("empty", "gather8", "packed4", "packed4sel"):
        blk = block if mode in ("gather8", "empty") else pack_block(block)
        args = (jnp.asarray(blk), jnp.asarray(row), jnp.asarray(ln))
        out = run(mode, *args, mix=127, iters=ITERS)
        float(np.asarray(out).sum())  # compile + force through the tunnel
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(mode, *args, mix=127, iters=ITERS)
            float(np.asarray(out).sum())
            best = min(best, time.perf_counter() - t0)
        times[mode] = best / ITERS * 1e9
        net = times[mode] - times.get("empty", 0.0) if mode != "empty" else 0.0
        print(f"  {mode:11s} {times[mode]:8.1f} ns/iter"
              + (f"  (net {net:.1f})" if mode != "empty" else ""))

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
