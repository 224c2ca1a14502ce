"""Tracing / profiling utilities.

The reference's only instrumentation is the 1 Hz frame-budget printout
(reference main.swift:143-153, mirrored in utils/telemetry.py). The TPU-native
equivalents here: ``jax.profiler`` trace capture around render calls, and
steady-state device timing that chains frames in one ``lax.scan`` so tunneled or
high-latency attachments don't pollute the numbers (see bench.py for the
protocol rationale).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def steady_state_frame_time(
    render_one: Callable,
    matrices: np.ndarray,
    *,
    trials: int = 3,
    checksum_stride: int = 64,
) -> float:
    """Median steady-state seconds/frame of ``render_one(m) -> (pixels, depth)``.

    Chains len(matrices) frames inside one jitted ``lax.scan`` (per-frame
    checksums keep every frame live), subtracts the measured cost of an
    identical empty chain (dispatch + host roundtrip), and returns the best of
    ``trials`` runs.
    """
    import jax
    import jax.numpy as jnp

    mats = jnp.asarray(matrices, jnp.float32)
    frames = mats.shape[0]

    @jax.jit
    def chain(ms):
        def body(c, m):
            px, _ = render_one(m)
            return c, px[::checksum_stride, ::checksum_stride].astype(
                jnp.uint32).sum()
        _, sums = jax.lax.scan(body, 0, ms)
        return sums

    @jax.jit
    def empty(ms):
        def body(c, m):
            return c, m.sum()
        _, sums = jax.lax.scan(body, 0, ms)
        return sums

    def timed(fn):
        float(np.asarray(fn(mats)).sum())  # compile + warm
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(np.asarray(fn(mats)).sum())
            best = min(best, (time.perf_counter() - t0) / frames)
        return best

    overhead = timed(empty)
    return max(timed(chain) - overhead, 1e-9)
