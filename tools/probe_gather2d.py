"""Re-probe of Mosaic gather capabilities for the texel fetch (round 4).

The round-2 ledger (docs/KERNEL.md) recorded multi-dim / multi-vreg
`tpu.dynamic_gather` as unsupported ("Not implemented: Zero or multiple
gather dimensions"), forcing the 8-row broadcast/gather/select unroll per
atlas block. The ledger says to re-test when jaxlib moves; this probe does
that on the current jaxlib, per variant:

  base8      the shipped pattern: 8x (sublane-broadcast + lane gather) +
             7-select tree (cost baseline)
  sub8       ONE sublane gather: take_along_axis((8,128), idx, axis=0)
  ta1024     ONE lane gather across 8 vregs: block flattened to (1, 1024),
             broadcast to (SPH, 1024), take_along_axis(idx in [0,1024))
             -- if this compiles, one gather + one mask replaces the whole
             8-row unroll (atlas re-tiled at upload to (rows/8, 1024)/chunk)
  take1024   jnp.take of a (1024,) slice with (SPH, 128) indices
  ta4096     as ta1024 but all 4 chunks wide (kills the chunk loop too)

Each variant is correctness-checked against numpy, then timed with the
fetch_microbench chained-fori protocol. Run on the chip:
    PYTHONPATH=. python tools/probe_gather2d.py
"""

from __future__ import annotations

import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SPH = 16
ITERS = 200000
NBLK = 64  # blocks in the probe atlas (one 512-row texture, one chunk)


def make_kernel(mode: str, iters: int):
    """atlas layouts per mode:
    base8/sub8: (NBLK*8, 128)   rows x one lane chunk
    ta1024/take1024: (NBLK, 1024) block-flattened, idx = (rel<<7)|ln
    ta4096: (NBLK, 4096) 4-chunk block rows, idx = (rel<<9)|lx
    """

    def kernel(atlas_ref, rel_ref, ln_ref, out_ref):
        REL = rel_ref[:]          # (SPH, 128) in [0, 8)
        ln0 = ln_ref[:]           # (SPH, 128) in [0, 128) (or [0,512) ta4096)
        zi = jnp.zeros((SPH, 128), jnp.int32)

        def body(b, gp):
            b = b % NBLK
            if mode == "base8":
                block = atlas_ref[pl.ds(pl.multiple_of(b * 8, 8), 8),
                                  pl.ds(0, 128)]
                g = [jnp.take_along_axis(
                        jnp.broadcast_to(block[r: r + 1, :], (SPH, 128)),
                        ln0, axis=1)
                     for r in range(8)]
                s0 = [jnp.where((REL & 1) != 0, g[i + 1], g[i])
                      for i in (0, 2, 4, 6)]
                s1 = [jnp.where((REL & 2) != 0, s0[i + 1], s0[i])
                      for i in (0, 2)]
                sel = jnp.where((REL & 4) != 0, s1[1], s1[0])
                return gp ^ sel
            if mode == "sub8":
                # Sublane gather only resolves the row at the pixel's own
                # lane (not its texel column) -- semantics probe, not a
                # fetch replacement on its own.
                block = atlas_ref[pl.ds(pl.multiple_of(b * 8, 8), 8),
                                  pl.ds(0, 128)]
                src = jnp.concatenate([block, block], axis=0)[:SPH]
                return gp ^ jnp.take_along_axis(src, REL, axis=0)
            if mode in ("ta1024", "take1024"):
                row = atlas_ref[pl.ds(b, 1), pl.ds(0, 1024)]   # (1, 1024)
                idx = (REL << 7) | ln0
                if mode == "take1024":
                    return gp ^ jnp.take(row.reshape(1024), idx)
                src = jnp.broadcast_to(row, (SPH, 1024))
                return gp ^ jnp.take_along_axis(src, idx, axis=1)
            if mode == "ta4096":
                row = atlas_ref[pl.ds(b, 1), pl.ds(0, 4096)]
                idx = (REL << 9) | ln0
                src = jnp.broadcast_to(row, (SPH, 4096))
                return gp ^ jnp.take_along_axis(src, idx, axis=1)
            raise ValueError(mode)

        out_ref[:] = jax.lax.fori_loop(0, iters, body, zi)

    return kernel


def atlas_for(mode: str, rng: np.random.Generator) -> np.ndarray:
    rows = rng.integers(0, 1 << 30, size=(NBLK * 8, 512), dtype=np.int32)
    if mode in ("base8", "sub8"):
        return rows[:, :128]
    if mode in ("ta1024", "take1024"):
        return rows[:, :128].reshape(NBLK, 1024)
    return rows.reshape(NBLK, 4096)


def expected(mode: str, atlas: np.ndarray, rel, ln, iters: int) -> np.ndarray:
    acc = np.zeros((SPH, 128), np.int32)
    for it in range(iters):
        b = it % NBLK
        if mode in ("base8", "ta1024", "take1024"):
            if mode == "base8":
                blk = atlas[b * 8: b * 8 + 8]
            else:
                blk = atlas[b].reshape(8, 128)
            acc ^= blk[rel, ln]
        elif mode == "sub8":
            blk = atlas[b * 8: b * 8 + 8]
            src = np.concatenate([blk, blk], axis=0)[:SPH]
            acc ^= np.take_along_axis(src, rel, axis=0)
        else:
            blk = atlas[b].reshape(8, 512)
            acc ^= blk[rel, ln]
    return acc


def build(mode: str, iters: int):
    f = pl.pallas_call(
        make_kernel(mode, iters),
        out_shape=jax.ShapeDtypeStruct((SPH, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda a, r, l: f(a, r, l))


def main() -> int:
    print(f"jax {jax.__version__}, backend {jax.default_backend()}")
    rng = np.random.default_rng(0)
    rel = rng.integers(0, 8, size=(SPH, 128)).astype(np.int32)
    lx = rng.integers(0, 512, size=(SPH, 128)).astype(np.int32)
    results = {}
    for mode in ("base8", "sub8", "ta1024", "take1024", "ta4096"):
        atlas = atlas_for(mode, rng)
        ln = lx if mode == "ta4096" else (lx & 127)
        try:
            got = np.asarray(build(mode, 3)(atlas, rel, ln))
            want = expected(mode, atlas, rel, ln, 3)
            if not np.array_equal(got, want):
                print(f"{mode:9s}: COMPILES but WRONG "
                      f"({(got != want).mean() * 100:.1f}% mismatch)")
                continue
            g = build(mode, ITERS)
            s = jax.jit(lambda a, r, l: g(a, r, l).sum())
            float(s(atlas, rel, ln))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(s(atlas, rel, ln))
                best = min(best, time.perf_counter() - t0)
            ns = best / ITERS * 1e9
            results[mode] = ns
            print(f"{mode:9s}: PASS  {ns:7.1f} ns/iter")
        except Exception as e:  # noqa: BLE001 -- report and move on
            msg = str(e).split("\n")[0][:160]
            print(f"{mode:9s}: FAIL  {type(e).__name__}: {msg}")
            if "--trace" in __import__("sys").argv:
                traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
