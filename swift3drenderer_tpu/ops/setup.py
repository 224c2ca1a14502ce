"""Per-triangle raster setup — all per-triangle constants of the reference's
triangle loop (render/render.swift:274-318) computed as one dense batch.

The output is a structure-of-arrays "setup table" over S = 2T slots (post-clip);
culled/invalid slots stay in the table with ``live == False`` so every downstream
shape is static.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

Setup = Dict[str, jnp.ndarray]


def edge_function(ax, ay, bx, by, cx, cy):
    """Signed parallelogram area (render.swift:89-92), coordinate-wise form."""
    return (cx - ax) * (ay - by) + (cy - ay) * (bx - ax)


def triangle_setup(corners: Dict[str, jnp.ndarray], width, height,
                   min_area: float) -> Setup:
    # width/height may be python ints (exact-size compile) or traced f32
    # scalars (bucketed live resize: raster extent compiled at the bucket
    # size, true dims only clamp coverage) — both exact in f32.
    rv = corners["rv"]                       # (S, 3, 3)
    cv = corners["cv"]
    attr = corners["attr"]
    n = corners["n"]
    valid = corners["valid"]

    rvmax = rv.max(axis=1)                   # (S, 3)
    rvmin = rv.min(axis=1)
    # Screen-bounds reject (render.swift:274-277) and small/backface area cull
    # (render.swift:279-280).
    area = edge_function(rv[:, 0, 0], rv[:, 0, 1], rv[:, 1, 0], rv[:, 1, 1],
                         rv[:, 2, 0], rv[:, 2, 1])
    live = (
        valid
        & (rvmax[:, 0] >= 0) & (rvmax[:, 1] >= 0)
        & (rvmin[:, 0] < width) & (rvmin[:, 1] < height)
        & (area >= min_area)
    )
    ooa = jnp.where(area != 0, 1.0 / area, 0.0)

    # Closed-form barycentric setup at the global pixel-(0, 0) center:
    # w(px, py) = w00 + px * dx + py * dy (replaces the incremental edge walk,
    # render.swift:286-291, 334-339).
    p = jnp.float32(0.5)
    w00 = jnp.stack(
        [edge_function(rv[:, 1, 0], rv[:, 1, 1], rv[:, 2, 0], rv[:, 2, 1], p, p),
         edge_function(rv[:, 2, 0], rv[:, 2, 1], rv[:, 0, 0], rv[:, 0, 1], p, p),
         edge_function(rv[:, 0, 0], rv[:, 0, 1], rv[:, 1, 0], rv[:, 1, 1], p, p)],
        axis=1) * ooa[:, None]
    dx = jnp.stack(
        [rv[:, 1, 1] - rv[:, 2, 1],
         rv[:, 2, 1] - rv[:, 0, 1],
         rv[:, 0, 1] - rv[:, 1, 1]], axis=1) * ooa[:, None]
    dy = jnp.stack(
        [rv[:, 2, 0] - rv[:, 1, 0],
         rv[:, 0, 0] - rv[:, 2, 0],
         rv[:, 1, 0] - rv[:, 0, 0]], axis=1) * ooa[:, None]

    # Integer bbox, truncation semantics matching Swift Int() (render.swift:282-285).
    xmin = jnp.maximum(0.0, rvmin[:, 0]).astype(jnp.int32)
    xmax = jnp.minimum(jnp.asarray(width, jnp.float32) - 1,
                       rvmax[:, 0]).astype(jnp.int32)
    ymin = jnp.maximum(0.0, rvmin[:, 1]).astype(jnp.int32)
    ymax = jnp.minimum(jnp.asarray(height, jnp.float32) - 1,
                       rvmax[:, 1]).astype(jnp.int32)

    # Perspective premultiply (render.swift:297-299).
    rvz = 1.0 / rv[:, :, 2]                  # (S, 3)
    cvp = cv * rvz[..., None]
    np_ = n * rvz[..., None]
    attrp = attr * rvz[..., None]

    # Texture constants (render.swift:305-311): dz = (rvz.dx, rvz.dy);
    # tpp = (sum u'_i dx_i, sum v'_i dy_i).
    dzv = jnp.stack([(rvz * dx).sum(axis=1), (rvz * dy).sum(axis=1)], axis=1)
    tpp = jnp.stack([(attrp[:, :, 0] * dx).sum(axis=1),
                     (attrp[:, :, 1] * dy).sum(axis=1)], axis=1)

    return dict(
        live=live,
        w00=w00, dx=dx, dy=dy, rvz=rvz,
        cvp=cvp, np=np_, attrp=attrp,
        tex=corners["tex"].astype(jnp.int32),
        is_tex=corners["tex"] >= 0,
        tpp=tpp, dzv=dzv,
        xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
    )
