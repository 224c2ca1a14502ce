"""Offline analysis of the in-kernel texel fetch's iteration shape.

Replays the golden pipeline at a given config while recording, for every
finally-visible textured pixel, its atlas coordinates (absolute row incl. the
texture base, column). Then models the Pallas fetch phase: per (tile, strip),
the per-texture row-block ranges and column-chunk ranges the kernel's fori
loops would scan. Prints the histogram + totals that bound what loop-structure
changes can save (docs/KERNEL.md "performance anatomy").

Usage: PYTHONPATH=. python tools/fetch_shape_analysis.py [--width W --height H]
"""

from __future__ import annotations

import argparse
from collections import Counter

import numpy as np

from swift3drenderer_tpu.camera import Camera, Input
from swift3drenderer_tpu.config import DEFAULT_CONFIG
from swift3drenderer_tpu.golden import renderer as G
from swift3drenderer_tpu.models import SCENES
from swift3drenderer_tpu.utils.ripmap import next_power_of_two


def texel_planes(scene, m, width, height, cfg):
    """Golden render that also returns per-pixel (tex, atlas_y_abs, atlas_x)."""
    f32 = np.float32
    # Reuse the golden renderer for depth/winner resolution by re-running its
    # triangle loop; simplest correct approach: call render_frame once to get
    # the final depth, then replay and record coords where ooz == final depth
    # (strictly-greater updates make the final depth unique per pixel).
    _, depth_final = G.render_frame(scene, m, width=width, height=height, config=cfg)

    ty_plane = np.full((height, width), -1, np.int64)
    tx_plane = np.full((height, width), -1, np.int64)

    near = f32(cfg.near)
    factor = f32(cfg.factor(height))
    half_w, half_h = f32(width) / 2, f32(height) / 2
    m = m.astype(f32)

    cv_all = scene.vertices.astype(f32) @ m.T
    rv_all = G.project(cv_all, factor, half_w, half_h)
    n_all = scene.normals.astype(f32) @ m.T
    vi = scene.vertex_indices.reshape(-1, 3)
    ai = scene.attribute_indices.reshape(-1, 3)
    jobs = [
        G.TriJob(cv=cv_all[vi[t]], rv=rv_all[vi[t]],
                 attr=scene.attr_vec[ai[t]].astype(f32), n=n_all[ai[t]],
                 tex=int(scene.attr_tex[ai[t][0]]))
        for t in range(vi.shape[0])
    ]
    idx = 0
    depth = np.zeros((height, width), f32)
    while idx < len(jobs):
        job = jobs[idx]
        idx += 1
        rvz_corner = job.rv[:, 2]
        if rvz_corner.max() <= near:
            continue
        if rvz_corner.min() < near:
            job, appended = G.clip_near(job, near, factor, half_w, half_h)
            if appended is not None:
                jobs.append(appended)
            rvz_corner = job.rv[:, 2]
        rvmax, rvmin = job.rv.max(axis=0), job.rv.min(axis=0)
        if rvmax[0] < 0 or rvmax[1] < 0 or rvmin[0] >= width or rvmin[1] >= height:
            continue
        area = G.edge_function(job.rv[0], job.rv[1], job.rv[2])
        if area < cfg.min_area:
            continue
        ooa = f32(1.0) / f32(area)
        xmin, xmax = int(max(0.0, rvmin[0])), int(min(width - 1.0, rvmax[0]))
        ymin, ymax = int(max(0.0, rvmin[1])), int(min(height - 1.0, rvmax[1]))
        p00 = np.array([0.5, 0.5, 0.0], f32)
        w00 = np.array([G.edge_function(job.rv[1], job.rv[2], p00),
                        G.edge_function(job.rv[2], job.rv[0], p00),
                        G.edge_function(job.rv[0], job.rv[1], p00)], f32) * ooa
        dx = np.array([job.rv[1, 1] - job.rv[2, 1], job.rv[2, 1] - job.rv[0, 1],
                       job.rv[0, 1] - job.rv[1, 1]], f32) * ooa
        dy = np.array([job.rv[2, 0] - job.rv[1, 0], job.rv[0, 0] - job.rv[2, 0],
                       job.rv[1, 0] - job.rv[0, 0]], f32) * ooa
        rvz = (f32(1.0) / rvz_corner).astype(f32)
        attrp = job.attr * rvz[:, None]
        px = np.arange(xmin, xmax + 1, dtype=f32)
        py = np.arange(ymin, ymax + 1, dtype=f32)
        w = (w00[None, None, :] + px[None, :, None] * dx[None, None, :]
             + py[:, None, None] * dy[None, None, :]).astype(f32)
        cover = (w >= 0).all(axis=-1)
        ooz = (w @ rvz).astype(f32)
        dwin = depth[ymin:ymax + 1, xmin:xmax + 1]
        visible = cover & (ooz > dwin)
        if not visible.any():
            continue
        dwin[visible] = ooz[visible]
        if job.tex < 0:
            tywin = ty_plane[ymin:ymax + 1, xmin:xmax + 1]
            txwin = tx_plane[ymin:ymax + 1, xmin:xmax + 1]
            tywin[visible] = -1
            txwin[visible] = -1
            continue
        wt = w / ooz[..., None]
        uvp = attrp[:, :2]
        dz = np.array([np.dot(rvz, dx), np.dot(rvz, dy)], f32)
        tpp = (uvp[0] * np.array([dx[0], dy[0]], f32)
               + uvp[1] * np.array([dx[1], dy[1]], f32)
               + uvp[2] * np.array([dx[2], dy[2]], f32))
        mapping = wt @ uvp
        with np.errstate(divide="ignore", invalid="ignore"):
            level = (ooz[..., None] / np.abs(tpp - mapping * dz)).astype(f32)
        lv = np.clip(np.nan_to_num(level, nan=256.0, posinf=256.0), 1.0, 256.0)
        lp = np.vectorize(next_power_of_two)(lv)
        t_ = (np.fmod(mapping, 1.0) * lp).astype(np.int64)
        addr = t_ + (511 & ~(2 * lp - 1))
        lx = np.clip(addr[..., 0], 0, 511)
        ly = np.clip(addr[..., 1], 0, 511) + job.tex * 512
        tywin = ty_plane[ymin:ymax + 1, xmin:xmax + 1]
        txwin = tx_plane[ymin:ymax + 1, xmin:xmax + 1]
        tywin[visible] = ly[visible]
        txwin[visible] = lx[visible]

    assert np.allclose(depth, depth_final), "replay diverged from golden"
    return ty_plane, tx_plane


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="default")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--tile-h", type=int, default=64)
    p.add_argument("--strip-h", type=int, default=32)
    p.add_argument("--flight-frame", type=int, default=0,
                   help="model the bench flight's pose at this frame "
                        "(0 = initial camera)")
    args = p.parse_args()

    scene = SCENES[args.scene](seed=0)
    # Replicate the bench flight exactly: frame k's matrix is k+1 updates
    # each with up=1.0 (incl. the forced frame-0 update).
    cam = Camera()
    m = cam.update(Input(up=1.0, mouse=(0.0, 0.0)), force_update=True)
    for i in range(1, args.flight_frame + 1):
        m = cam.update(Input(up=1.0, mouse=(2.0 * i, 0.0)))
    m = np.asarray(m, np.float32)
    ty, tx = texel_planes(scene, m, args.width, args.height, DEFAULT_CONFIG)

    W, H, TH, SH = args.width, args.height, args.tile_h, args.strip_h
    ntx, nty = -(-W // 128), -(-H // TH)
    blocks_hist = Counter()
    chunk_hist = Counter()
    ntex_hist = Counter()
    rowspan_hist = Counter()
    tot_strips = tot_active = tot_blocks = tot_chunkiters = tot_texiters = 0
    tot_blocks_perchunk = [0]
    tot_blocks_touched = [0]
    tot_blocks_split = [0]
    tiles_active = set()
    for tyi in range(nty):
        for txi in range(ntx):
            for s in range(TH // SH):
                y0 = tyi * TH + s * SH
                sy = slice(y0, min(y0 + SH, H))
                sx = slice(txi * 128, min(txi * 128 + 128, W))
                T, X = ty[sy, sx], tx[sy, sx]
                act = T >= 0
                tot_strips += 1
                if not act.any():
                    continue
                tiles_active.add((tyi, txi))
                tot_active += 1
                texids = np.unique(T[act] >> 9)
                # kernel scans tmin..tmax inclusive
                tot_texiters += int(texids.max() - texids.min() + 1)
                ntex_hist[len(texids)] += 1
                for t in texids:
                    sel = act & ((T >> 9) == t)
                    rmin, rmax = T[sel].min(), T[sel].max()
                    nb = (rmax >> 3) - (rmin >> 3) + 1
                    cmin, cmax = X[sel].min() >> 7, X[sel].max() >> 7
                    nc = cmax - cmin + 1
                    blocks_hist[int(nb)] += 1
                    chunk_hist[int(nc)] += 1
                    rowspan_hist[int(rmax - rmin + 1)] += 1
                    tot_blocks += int(nb) * int(nc)
                    tot_chunkiters += int(nc)
                    # Per-chunk row ranges (the kernel scans the union range
                    # once per chunk; a per-chunk range skips the blocks the
                    # chunk never touches).
                    for c in range(int(cmin), int(cmax) + 1):
                        selc = sel & ((X >> 7) == c)
                        if not selc.any():
                            continue
                        rc0, rc1 = T[selc].min(), T[selc].max()
                        tot_blocks_perchunk[0] += int(
                            (rc1 >> 3) - (rc0 >> 3) + 1)
                        # Distinct TOUCHED blocks: what an extract-next-block
                        # iteration (min-reduce over unresolved pixels) would
                        # scan instead of the [rmin, rmax] range.
                        tot_blocks_touched[0] += len(np.unique(T[selc] >> 3))
                    # Midpoint-split model (per (strip,tex), chunks unrolled
                    # as the kernel's flat path does): two sub-ranges
                    # [rmin, max-below-mid] and [min-at-or-above-mid, rmax].
                    mid = (rmin + rmax + 1) // 2
                    lo = T[sel][T[sel] < mid]
                    hi = T[sel][T[sel] >= mid]
                    nb2 = 0
                    b_hi_start = None
                    if lo.size:
                        nb2 += int((lo.max() >> 3) - (rmin >> 3) + 1)
                        b_hi_start = (lo.max() >> 3) + 1
                    if hi.size:
                        s = int(hi.min() >> 3)
                        if b_hi_start is not None:
                            s = max(s, b_hi_start)
                        nb2 += max(0, int(rmax >> 3) - s + 1)
                    tot_blocks_split[0] += nb2 * int(nc)

    print(f"{args.scene} {W}x{H} tile_h={TH} strip_h={SH}:")
    print(f"  strips: {tot_strips} total, {tot_active} with textured winners; "
          f"tiles w/ textured winners: {len(tiles_active)}")
    print(f"  per-strip texture count hist: {dict(sorted(ntex_hist.items()))}")
    print(f"  per-(strip,tex) row-block count hist: {dict(sorted(blocks_hist.items()))}")
    print(f"  per-(strip,tex) chunk count hist: {dict(sorted(chunk_hist.items()))}")
    print(f"  per-(strip,tex) row-span hist: {dict(sorted(rowspan_hist.items()))}")
    print(f"  TOTALS: block-chunk iterations {tot_blocks} "
          f"(per-chunk ranges: {tot_blocks_perchunk[0]}, "
          f"distinct touched: {tot_blocks_touched[0]}, "
          f"midpoint-split: {tot_blocks_split[0]}), "
          f"tex iterations {tot_texiters}")
    # Cost model: ~300 ns fixed per block-chunk iteration + vector work
    print(f"  modelled fixed block cost @300ns: {tot_blocks * 300e-9 * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
