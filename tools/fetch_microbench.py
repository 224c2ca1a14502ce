"""Microbenchmark of the texel-fetch block loop in isolation.

Times one Pallas kernel that runs N iterations of the fetch phase's inner
block-chunk body over a VMEM-resident atlas, with each cost component
toggleable:

  full       load + 8x (row broadcast + lane gather + compare/select tree-OR)
  noload     constant block instead of the dynamic-slice load
  nogather   row broadcast + select, gather replaced by the broadcast row
  noselect   load + gathers only (accumulate by OR without compare)
  loadonly   just the dynamic-slice load, accumulated by OR of row 0
  empty      loop bookkeeping only

The difference between rows isolates each component's per-iteration cost.
Run on the chip: PYTHONPATH=. python tools/fetch_microbench.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SPH = 32          # pixel strip height (matches _FETCH_STRIP_H)
ITERS = 400000    # enough that per-iteration work dwarfs the ~28 ms dispatch


def make_kernel(mode: str):
    def kernel(atlas_ref, key_ref, ln_ref, out_ref):
        KEY = key_ref[:]
        ln0 = ln_ref[:]
        zi = jnp.zeros((SPH, 128), jnp.int32)
        const_block = jnp.full((8, 128), 7, jnp.int32)

        def body(b, gp):
            if mode == "empty":
                return gp | b
            if mode == "noload":
                block = const_block
            else:
                block = atlas_ref[pl.ds(pl.multiple_of((b % 64) * 8, 8), 8),
                                  pl.ds(0, 128)]
            if mode == "loadonly":
                return gp | jnp.broadcast_to(block[0:1, :], (SPH, 128))
            contribs = []
            for r in range(8):
                y = b * 8 + r
                rowb = jnp.broadcast_to(block[r: r + 1, :], (SPH, 128))
                if mode == "nogather":
                    g = rowb
                else:
                    g = jnp.take_along_axis(rowb, ln0, axis=1)
                if mode == "noselect":
                    contribs.append(g)
                else:
                    contribs.append(jnp.where(KEY == y, g, 0))
            t = contribs
            while len(t) > 1:
                t = [t[i] | t[i + 1] if i + 1 < len(t) else t[i]
                     for i in range(0, len(t), 2)]
            return gp | t[0]

        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, zi)

    return kernel


def run(mode: str) -> float:
    atlas = jnp.arange(512 * 512, dtype=jnp.int32).reshape(512, 512)
    key = jnp.arange(SPH * 128, dtype=jnp.int32).reshape(SPH, 128) % 512
    ln = key & 127

    f = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((SPH, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    g = jax.jit(lambda a, k, l: f(a, k, l).sum())
    float(g(atlas, key, ln))  # compile
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(g(atlas, key, ln))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    base = None
    for mode in ["empty", "loadonly", "nogather", "noselect", "full",
                 "noload"]:
        t = run(mode)
        ns = t / ITERS * 1e9
        print(f"{mode:9s}: {t * 1e3:7.3f} ms total, {ns:7.1f} ns/iter")


if __name__ == "__main__":
    main()
