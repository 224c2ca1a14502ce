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


def sample_ripmap_bilinear(textures: jnp.ndarray, tex_idx: jnp.ndarray,
                           uv: jnp.ndarray, level: jnp.ndarray) -> jnp.ndarray:
    """Bilinear fetch within the selected ripmap level (framework extension,
    matches utils.ripmap.sample_ripmap_bilinear): texel centers at integer+0.5,
    repeat wrapping."""
    lv = jnp.clip(jnp.nan_to_num(level, nan=256.0, posinf=256.0, neginf=1.0),
                  1.0, 256.0)
    lp = next_power_of_two(lv)
    frac = jnp.mod(jnp.nan_to_num(uv), 1.0)
    t = frac * lp - 0.5
    t0 = jnp.floor(t).astype(jnp.int32)
    w = (t - t0).astype(jnp.float32)
    off = 511 & ~(2 * lp - 1)
    nt = textures.shape[0]
    flat = textures.reshape(-1)
    base = jnp.clip(tex_idx, 0, max(nt - 1, 0)) * (ATLAS_EDGE * ATLAS_EDGE)

    def fetch(ix, iy):
        x = jnp.clip(jnp.mod(ix, lp[..., 0]) + off[..., 0], 0, ATLAS_EDGE - 1)
        y = jnp.clip(jnp.mod(iy, lp[..., 1]) + off[..., 1], 0, ATLAS_EDGE - 1)
        rgb = jnp.take(flat, base + y * ATLAS_EDGE + x, mode="clip")
        return jnp.stack(
            [(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF], axis=-1
        ).astype(jnp.float32)

    x0, y0 = t0[..., 0], t0[..., 1]
    wx, wy = w[..., 0:1], w[..., 1:2]
    return ((1 - wx) * (1 - wy) * fetch(x0, y0)
            + wx * (1 - wy) * fetch(x0 + 1, y0)
            + (1 - wx) * wy * fetch(x0, y0 + 1)
            + wx * wy * fetch(x0 + 1, y0 + 1))
