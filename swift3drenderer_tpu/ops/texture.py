"""Ripmap texture sampling on device — vectorized form of the reference's
``getTextureColor`` (render/render.swift:94-111).

The atlases (one 512x512 u32 image per texture) live in HBM as a single
``(NT, 512, 512)`` array; sampling is a flat gather. Addressing is reference-exact:
per-axis level clamp to [1, 256], truncate-then-next-power-of-two, and texel
address ``trunc(fmod(uv, 1) * L) + (511 & ~(2L - 1))``.
"""

from __future__ import annotations

import jax.numpy as jnp

ATLAS_EDGE = 512


def next_power_of_two(level: jnp.ndarray) -> jnp.ndarray:
    """Truncate-then-round-up-to-pow2 on int32 (render.swift:95-101); valid for
    clamped inputs in [1, 256] so two shift rounds cover all 8 bits."""
    i = level.astype(jnp.int32) - 1
    i = i | (i >> 1)
    i = i | (i >> 2)
    i = i | (i >> 4)
    return i + 1


def sample_ripmap(textures: jnp.ndarray, tex_idx: jnp.ndarray, uv: jnp.ndarray,
                  level: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor anisotropic ripmap fetch.

    textures: (NT, 512, 512) uint32; tex_idx: (...,) int32; uv/level: (..., 2).
    Returns (..., 3) float32 RGB in [0, 255]. Non-finite uv/level (pixels masked
    out downstream) are sanitized so gathers stay in range.
    """
    lv = jnp.clip(jnp.nan_to_num(level, nan=256.0, posinf=256.0, neginf=1.0),
                  1.0, 256.0)
    lp = next_power_of_two(lv)
    frac = jnp.fmod(jnp.nan_to_num(uv), 1.0)
    t = (frac * lp).astype(jnp.int32)  # truncates toward zero like Swift Int()
    addr = t + (511 & ~(2 * lp - 1))   # Swift & binds at * precedence
    x = jnp.clip(addr[..., 0], 0, ATLAS_EDGE - 1)
    y = jnp.clip(addr[..., 1], 0, ATLAS_EDGE - 1)
    nt = textures.shape[0]
    flat = textures.reshape(-1)
    idx = jnp.clip(tex_idx, 0, max(nt - 1, 0)) * (ATLAS_EDGE * ATLAS_EDGE) \
        + y * ATLAS_EDGE + x
    rgb = jnp.take(flat, idx, mode="clip")
    return jnp.stack(
        [(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF], axis=-1
    ).astype(jnp.float32)
