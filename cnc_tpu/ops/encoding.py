"""Multiresolution hash-grid encoding (the CNC keystone op).

TPU-native re-design of the reference CUDA encoder (gridencoder/src/
gridencoder.cu:45-396 forward, :399-585 backward):

  * per level: map points in [0,1]^D to a (R-2)-cell lattice with a one-cell
    zero border (`pos = x*(R-2)+0.5`), gather the 2^D corners with D-linear
    weights;
  * corners touching the border (coord 0 or R-1) are excluded (`zero_flag`,
    gridencoder.cu:212-219);
  * when an occupancy grid is given, corners whose +-1-cell footprint maps to
    an all-empty region are excluded (gridencoder.cu:222-276) — here a 2^D
    summed-area-table query instead of a cell-walk;
  * weights are renormalized over surviving corners (`wn_re`,
    gridencoder.cu:288-310);
  * hashing matches `fast_hash`/`get_grid_index` bit for bit (ops/hash_ops).

The backward pass (scatter-add of w * wn_re * grad into the table,
gridencoder.cu:399-585) runs through a custom VJP (ops/scatter_ops.
grouped_gather_interp): per-feature 1-D column scatter-adds, measured ~7-10
ns/update on v5e — the hardware floor for this op (a Pallas serial
lane-RMW alternative was probed on real v5e and Mosaic rejects the
construct outright; see scatter_ops.grouped_gather_interp docstring and
tools/pallas_scatter_probe_r4.py).

Three entry points mirror the reference GridEncoder's forwards
(ngp.py:228-315): `grid_encode` (static level range), `grid_encode_diff_levels`
(per-point min level, one call for mixed-level context batches), and
`grid_encode_given_table` (external dense table, used by the dimension-wise
prior lookup).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GridSpec
from . import hash_ops, sat as sat_ops
from . import scatter_ops

# When True (default), the encode runs through the fused grouped op
# (ops/scatter_ops.grouped_gather_interp): layout-safe feature-major
# gathers and per-column scatter-add gradients.  False = plain jnp.take +
# einsum autodiff, kept for A/B testing.
USE_SORTED_BACKWARD = True


def _corner_setup(frac: jnp.ndarray, pg: jnp.ndarray, offset, hashmap_size,
                  resolution, occ_sat: Optional[jnp.ndarray], rb: int,
                  occ_mask=None, mask_offset=0):
    """Corner indices/weights for one level (no table access).

    Returns (gidx [N, 2^D] global table indices, w [N, 2^D] weights; masked
    corners carry weight 0 and index 0).  resolution/offset/hashmap_size may
    be python ints (static level) or per-point arrays (mixed levels).

    Corner occupancy masking takes one of two forms:
      * occ_mask: flat precomputed per-corner mask grid(s) (bool, row-major
        x*r^(D-1)+..+last-axis-fastest per level) with `mask_offset` (int or
        per-point array) selecting the level block — ONE gather per corner;
      * occ_sat: summed-area table of the occupancy grid — 2^D gathers per
        corner (kept for callers without prebuilt mask grids).
    occ_mask wins when both are given.
    """
    n, d = pg.shape
    res_is_static = isinstance(resolution, (int, np.integer))
    gidx_list = []
    w_list = []
    for corner in range(1 << d):
        bits = [(corner >> ax) & 1 for ax in range(d)]
        cc = []
        w = jnp.ones((n,), dtype=jnp.float32)
        for ax in range(d):
            if bits[ax]:
                cc.append(jnp.minimum(pg[:, ax] + 1, resolution - 1))
                w = w * frac[:, ax]
            else:
                cc.append(pg[:, ax])
                w = w * (1.0 - frac[:, ax])
        cc = jnp.stack(cc, axis=-1)  # [N, D] int32
        zero_flag = jnp.zeros((n,), dtype=bool)
        lim = (resolution - 1)
        for ax in range(d):
            zero_flag = zero_flag | (cc[:, ax] == 0) | (cc[:, ax] == lim)
        valid = ~zero_flag
        if occ_mask is not None:
            flat = cc[:, 0]
            for ax in range(1, d):
                flat = flat * resolution + cc[:, ax]
            valid = valid & occ_mask[mask_offset + flat]
        elif occ_sat is not None:
            m = sat_ops.occupancy_mask(occ_sat, cc, resolution, rb)
            valid = valid & m
        idx = hash_ops.grid_index(cc, resolution, hashmap_size)
        gidx_list.append(jnp.where(valid, idx + offset, 0))
        w_list.append(jnp.where(valid, w, 0.0))
    return jnp.stack(gidx_list, axis=-1), jnp.stack(w_list, axis=-1)


def _gather_levels(table: jnp.ndarray, gidx_list, w_list,
                   points: jnp.ndarray) -> jnp.ndarray:
    """Grouped gather + renormalize + oob masking over per-level corner sets.

    gidx_list/w_list: G arrays of [N, 2^D].  Returns [N, G*F] level-major
    feature blocks.  ONE grouped custom-vjp op per encode call (row gathers
    forward, per-feature column scatter-adds backward); big intermediates
    stay [N, K] 2-D — 4-D (level, corner, feature) reshapes make XLA pick
    tiled layouts that pad catastrophically (see ops/scatter_ops.py).
    """
    n = points.shape[0]
    g = len(gidx_list)
    c = gidx_list[0].shape[-1]
    f = table.shape[-1]
    gidx2 = jnp.concatenate(gidx_list, axis=1)        # [N, G*C]
    w2 = jnp.concatenate(w_list, axis=1)              # [N, G*C]
    if USE_SORTED_BACKWARD:
        # need_dw=False: CNC never needs d(out)/d(weights) — sample positions
        # and context lattice coords are not optimized (see scatter_ops)
        acc = scatter_ops.grouped_gather_interp(
            table.astype(jnp.float32), gidx2, w2, g, f, False)
    else:
        # reference path (plain autodiff scatter backward), for A/B testing
        feats = jnp.take(table, gidx2, axis=0,
                         mode="clip").astype(jnp.float32)  # [N, G*C, F]
        accs = []
        for gi in range(g):
            blk_w = w2[:, gi * c:(gi + 1) * c]
            blk_f = feats[:, gi * c:(gi + 1) * c]
            accs.append(jnp.einsum("nc,ncf->nf", blk_w, blk_f))
        acc = jnp.concatenate(accs, axis=1)
    acc = acc.reshape(n, g * f)
    # per-level weight sums: w2 columns are corner-major within each level
    wn = jnp.sum(w2.reshape(n, g, c), axis=-1)        # [N, G] (small dims ok)
    wn = jnp.where(wn == 0.0, 1e-9, wn)
    out = acc.reshape(n, g, f) / wn[..., None]
    oob = jnp.any((points < 0.0) | (points > 1.0), axis=-1)
    out = jnp.where(oob[:, None, None], 0.0, out)
    return out.reshape(n, g * f)


def _level_setup(points: jnp.ndarray, resolution):
    if isinstance(resolution, (int, np.integer)):
        x = points * np.float32(resolution - 2) + 0.5
    else:
        x = points * (resolution.astype(jnp.float32) - 2.0)[:, None] + 0.5
    pg = jnp.floor(x)
    frac = x - pg
    return frac, pg.astype(jnp.int32)


def encode_explicit(points: jnp.ndarray, table: jnp.ndarray,
                    resolutions: Sequence[int], offsets: Sequence[int],
                    occ_binary: Optional[jnp.ndarray] = None,
                    occ_sat: Optional[jnp.ndarray] = None,
                    occ_mask: Optional[jnp.ndarray] = None,
                    mask_offsets: Optional[Sequence[int]] = None) -> jnp.ndarray:
    """Encode against explicit per-level (resolution, offset) lists.

    offsets has len(resolutions)+1 entries; level table size is the diff —
    matching the raw CUDA call convention (_grid_encode, ngp.py:49-116).
    occ_mask/mask_offsets: flat per-corner mask grids + per-level start
    offsets (the fast masking path — see _corner_setup).
    """
    if occ_mask is None and occ_sat is None and occ_binary is not None:
        occ_sat = sat_ops.build_sat(occ_binary)
    rb = (occ_sat.shape[0] - 1) if occ_sat is not None else 0
    gs, ws = [], []
    for li, r in enumerate(resolutions):
        frac, pg = _level_setup(points, r)
        hs = offsets[li + 1] - offsets[li]
        moff = mask_offsets[li] if occ_mask is not None else 0
        gi, wi = _corner_setup(frac, pg, offsets[li], hs, int(r), occ_sat, rb,
                               occ_mask, moff)
        gs.append(gi)
        ws.append(wi)
    return _gather_levels(table, gs, ws, points)


def grid_encode(points: jnp.ndarray, table: jnp.ndarray, spec: GridSpec,
                min_level: int = 0, max_level: Optional[int] = None,
                occ_binary: Optional[jnp.ndarray] = None,
                occ_sat: Optional[jnp.ndarray] = None,
                occ_mask: Optional[jnp.ndarray] = None,
                mask_offsets: Optional[Sequence[int]] = None) -> jnp.ndarray:
    """Encode levels [min_level, max_level) of a GridSpec table.

    Args:
      points: [N, D] in [0, 1].
      table: [spec.total_entries, F].
      occ_binary/occ_sat: optional occupancy grid (or its prebuilt SAT) for
        corner masking; pass the SAT when calling repeatedly per step.
      occ_mask/mask_offsets: flat per-corner mask grids covering ALL spec
        levels + per-level offsets (fastest: one gather per corner).
    Returns:
      [N, (max_level-min_level) * F] float32, level-major feature blocks.
    """
    min_level = max(min_level, 0)
    max_level = spec.n_levels if max_level is None else min(max_level, spec.n_levels)
    res = spec.resolutions[min_level:max_level]
    offs = spec.offsets[min_level:max_level + 1]
    moffs = (mask_offsets[min_level:max_level]
             if mask_offsets is not None else None)
    return encode_explicit(points, table, res, offs, occ_binary, occ_sat,
                           occ_mask, moffs)


def grid_encode_diff_levels(points: jnp.ndarray, table: jnp.ndarray,
                            spec: GridSpec, min_level_ids: jnp.ndarray,
                            n_levels_calc: int,
                            occ_binary: Optional[jnp.ndarray] = None,
                            occ_sat: Optional[jnp.ndarray] = None,
                            occ_mask: Optional[jnp.ndarray] = None,
                            mask_offsets: Optional[Sequence[int]] = None
                            ) -> jnp.ndarray:
    """Per-point mixed-level encode (GridEncoder.forward_diff_levels).

    Point i contributes levels min_level_ids[i] .. min_level_ids[i]+J-1 in one
    call — the mixed-level batch trick the CUDA kernel supports through its
    `min_level_id` tensor (gridencoder.cu:120-126).
    """
    if occ_mask is None and occ_sat is None and occ_binary is not None:
        occ_sat = sat_ops.build_sat(occ_binary)
    rb = (occ_sat.shape[0] - 1) if occ_sat is not None else 0
    res_arr = jnp.asarray(spec.resolutions, dtype=jnp.int32)
    off_arr = jnp.asarray(spec.offsets[:-1], dtype=jnp.int32)
    hs_arr = jnp.asarray(
        [spec.offsets[i + 1] - spec.offsets[i] for i in range(spec.n_levels)],
        dtype=jnp.int32)
    moff_arr = (jnp.asarray(mask_offsets, dtype=jnp.int32)
                if occ_mask is not None else None)
    gs, ws = [], []
    for j in range(n_levels_calc):
        lvl = jnp.clip(min_level_ids + j, 0, spec.n_levels - 1)
        r = res_arr[lvl]
        off = off_arr[lvl]
        hs = hs_arr[lvl]
        frac, pg = _level_setup(points, r)
        moff = moff_arr[lvl] if occ_mask is not None else 0
        gi, wi = _corner_setup(frac, pg, off, hs, r, occ_sat, rb,
                               occ_mask, moff)
        gs.append(gi)
        ws.append(wi)
    return _gather_levels(table, gs, ws, points)


def grid_encode_given_table(points: jnp.ndarray, table: jnp.ndarray,
                            resolution: int,
                            occ_binary: Optional[jnp.ndarray] = None,
                            occ_sat: Optional[jnp.ndarray] = None,
                            occ_mask: Optional[jnp.ndarray] = None,
                            mask_offset: int = 0) -> jnp.ndarray:
    """One-level dense-table encode (GridEncoder.forward_given_params).

    Used for the dimension-wise prior: `table` is a dense [resolution**2, F]
    plane (e.g. the padded 514x514 sign-fraction map) flattened row-major with
    x fastest — i.e. flat = x + y*resolution, matching get_grid_index's dense
    ordering.  (The reference flattens its [514,514,F] map in torch's y-fastest
    order and then indexes it x-fastest, i.e. it reads the transposed map —
    utils_bpp_acc.py:528 vs gridencoder.cu:72-77.  We keep the orientation
    consistent instead; both codec sides use the same layout so the stream
    stays lossless.)
    """
    n_lvl_entries = table.shape[0]
    return encode_explicit(points, table, [resolution], [0, n_lvl_entries],
                           occ_binary, occ_sat, occ_mask,
                           [mask_offset] if occ_mask is not None else None)
