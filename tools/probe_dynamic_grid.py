"""On-chip feasibility probe for the round-4 streamed multipass.

Exercises, in one tiny kernel, every Mosaic feature the single-launch
streamed multipass needs (docs/KERNEL.md "Round-4"):

1. a DYNAMIC grid bound on the innermost (chunk) axis — a traced value;
2. output blocks whose index map IGNORES that axis (revisited blocks must
   stay VMEM-resident across chunk steps and accumulate);
3. SMEM-blocked inputs whose block index map SELECTS by the dynamic axis
   (the streamed per-chunk table windows);
4. a manual HBM->SMEM DMA at an index derived from the dynamic axis;
5. pl.when(c == 0) initialization of a revisited output block.

Prints PASS/FAIL per check. Run on the chip:  python tools/probe_dynamic_grid.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NT = 3        # tiles
NCMAX = 4     # static chunk capacity


def kernel(tab_ref, hbm_ref, out_ref, scratch_ref, sem):
    t = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # Manual HBM DMA indexed by the dynamic chunk axis.
    dma = pltpu.make_async_copy(hbm_ref.at[t * NCMAX + c], scratch_ref, sem)
    dma.start()
    dma.wait()
    # Accumulate: SMEM window (selected by c) + the DMA'd row.
    out_ref[...] += tab_ref[0, 0] + scratch_ref[0, 0].astype(jnp.float32)


@jax.jit
def run(tab, hbm, nc):
    return pl.pallas_call(
        kernel,
        grid=(NT, nc),
        in_specs=[
            pl.BlockSpec((8, 128), lambda t, c: (c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda t, c: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NT, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((8, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )(tab, hbm)


def main() -> int:
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    tab = jnp.arange(NCMAX * 8 * 128, dtype=jnp.float32).reshape(NCMAX * 8, 128)
    hbm = jnp.arange(NT * NCMAX * 8 * 128, dtype=jnp.int32).reshape(
        NT * NCMAX, 8, 128)
    failures = 0
    for nc in (1, 2, 4):
        got = np.asarray(run(tab, hbm, nc))
        want = np.zeros((NT, 8, 128), np.float32)
        for t in range(NT):
            for c in range(nc):
                want[t] += float(tab[c * 8, 0]) + float(hbm[t * NCMAX + c, 0, 0])
        ok = np.array_equal(got, want)
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'}  nc={nc}  "
              f"got[0,0,0]={got[0, 0, 0]} want={want[0, 0, 0]}")
    print("ALL PASS" if not failures else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
