"""Scatter-free scatter-add and the fused hash-grid gather/interp op.

Two TPU constraints shape this module:

  * XLA serializes scatter ops (~65ns/element even with unique indices —
    measured), so a training step's ~25M table-gradient updates would cost
    seconds.  Dense accumulations are built WITHOUT any scatter: one
    `lax.sort` of the updates plus one sentinel row per table entry, a
    chunked segmented scan, and a cumsum+searchsorted compaction of the run
    tails (all gathers).
  * compute ops force (8,128)-tiled layout copies, so any big array with a
    tiny minor dimension pads brutally (observed: an [35M, 4] f32 stack
    copied to 18GB).  Every large intermediate here is therefore a 1-D array
    (one per feature column) or a [N, >=96] 2-D array; features interleave
    only at small boundaries via static column permutations.

`grouped_gather_interp` covers ALL levels of a multiresolution encode in one
op so the backward runs a SINGLE merge-densify sort — per-level ops emitted
one huge bitonic sort each and blew up the TPU compiler.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

_SORT_CHUNK = 1 << 22


def _densify_one(cols, idx, size):
    """Dense per-entry sums of one update chunk: sort by entry, plain cumsum
    per column, and two masked unique-index scatters at the run boundaries
    (out[k] += csum_at_tail(k) - csum_before_head(k)).

    This replaced a sentinel-row + segmented-scan + searchsorted-compaction
    design: the 5-tuple associative_scan alone cost ~260s of TPU compile and
    the sentinel/searchsorted machinery ~0.7s of runtime per 4M-update chunk.
    Plain cumsums are native HLO and the boundary rows are unique within the
    chunk (non-boundary rows are routed out of range and dropped), so both
    scatters qualify for unique_indices=True.
    """
    sorted_arrs = jax.lax.sort((idx.astype(jnp.int32),) + tuple(cols),
                               num_keys=1)
    skeys = sorted_arrs[0]
    change = skeys[1:] != skeys[:-1]
    tail = jnp.concatenate([change, jnp.ones((1,), bool)])
    head = jnp.concatenate([jnp.ones((1,), bool), change])
    tidx = jnp.where(tail, skeys, size)
    hidx = jnp.where(head, skeys, size)
    outs = []
    for c in sorted_arrs[1:]:
        csum = jnp.cumsum(c)
        pre = jnp.concatenate([jnp.zeros((1,), c.dtype), csum[:-1]])
        o = jnp.zeros((size,), c.dtype).at[tidx].add(
            csum, mode="drop", unique_indices=True)
        o = o.at[hidx].add(-pre, mode="drop", unique_indices=True)
        outs.append(o)
    return tuple(outs)


def scatter_add_sorted_cols(cols, idx: jnp.ndarray, size: int):
    """Per-column zeros([size]).at[idx].add(col), scatter-free.

    cols: sequence of [N] 1-D float arrays sharing idx ([N] int32 in
    [0, size)).  Returns a tuple of [size] 1-D accumulations.

    Updates beyond _SORT_CHUNK are processed in fixed-size chunks under
    lax.scan (dense per-chunk results summed), so the compiled program
    contains exactly ONE sort instruction whatever the total — a single
    ~100M-element bitonic sort makes XLA's host passes run tens of minutes.
    """
    n = idx.shape[0]
    if n <= _SORT_CHUNK:
        return _densify_one(cols, idx, size)
    f = len(cols)
    q = -(-n // _SORT_CHUNK)
    pad = q * _SORT_CHUNK - n
    idx_p = jnp.pad(idx, (0, pad)).reshape(q, _SORT_CHUNK)
    cols_p = tuple(jnp.pad(x, (0, pad)).reshape(q, _SORT_CHUNK)
                   for x in cols)

    def body(acc, inp):
        idx_b = inp[0]
        cols_b = inp[1:]
        dense = _densify_one(cols_b, idx_b, size)
        return tuple(a + d for a, d in zip(acc, dense)), None

    acc0 = tuple(jnp.zeros((size,), x.dtype) for x in cols)
    acc, _ = jax.lax.scan(body, acc0, (idx_p,) + cols_p)
    return acc


def scatter_add_sorted(vals: jnp.ndarray, idx: jnp.ndarray,
                       size: int) -> jnp.ndarray:
    """Equivalent of zeros([size, F]).at[idx].add(vals), scatter-free."""
    f = vals.shape[1]
    outs = scatter_add_sorted_cols(tuple(vals[:, i] for i in range(f)), idx,
                                   size)
    return jnp.stack(outs, axis=-1)


def _out_perm(groups: int, f: int):
    """Static permutation: feature-major [N, F*G] -> level-major [N, G*F]."""
    import numpy as np
    perm = np.empty(groups * f, np.int32)
    for g in range(groups):
        for fi in range(f):
            perm[g * f + fi] = fi * groups + g
    return perm


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def grouped_gather_interp(table: jnp.ndarray, gidx2: jnp.ndarray,
                          w2: jnp.ndarray, groups: int, f: int) -> jnp.ndarray:
    """out[n, g*F+fi] = sum_c w2[n, g*C+c] * table[gidx2[n, g*C+c], fi].

    table: [T, F]; gidx2/w2: [N, G*C] (corner-major within each group).
    Returns [N, G*F] level-major feature blocks.  All big intermediates are
    per-feature [N, K] 2-D or 1-D arrays (see module docstring).
    """
    n, k = gidx2.shape
    c = k // groups
    tft = table.T                                     # [F, T]
    outs_f = []
    for fi in range(f):
        feats = tft[fi][gidx2]                        # [N, K]
        prod = w2 * feats
        acc = prod[:, 0::c]
        for ci in range(1, c):
            acc = acc + prod[:, ci::c]                # [N, G]
        outs_f.append(acc)
    out_fm = jnp.concatenate(outs_f, axis=1)          # [N, F*G]
    return out_fm[:, _out_perm(groups, f)]


def _ggi_fwd(table, gidx2, w2, groups, f):
    return (grouped_gather_interp(table, gidx2, w2, groups, f),
            (table, gidx2, w2))


def _ggi_bwd(groups, f, res, g):
    table, gidx2, w2 = res
    n, k = gidx2.shape
    c = k // groups
    t = table.shape[0]
    # per-feature 1-D update columns: upd(n, g, ci, fi) = g[n,g*F+fi]*w2[n,g*C+ci]
    cols = []
    for fi in range(f):
        gf = g[:, fi::f]                              # [N, G]
        gf_rep = jnp.repeat(gf, c, axis=1)            # [N, G*C]
        cols.append((gf_rep * w2).reshape(-1))        # [N*K]
    d_cols = scatter_add_sorted_cols(tuple(cols), gidx2.reshape(-1), t)
    d_table = jnp.stack(d_cols, axis=-1)              # [T, F] (small boundary)
    # d_w[n, g*C+c] = sum_f g[n, g*F+f] * table[gidx, f]
    tft = table.T
    d_w = jnp.zeros_like(w2)
    for fi in range(f):
        feats = tft[fi][gidx2]                        # [N, K]
        gf_rep = jnp.repeat(g[:, fi::f], c, axis=1)   # [N, K]
        d_w = d_w + gf_rep * feats
    return d_table, None, d_w


grouped_gather_interp.defvjp(_ggi_fwd, _ggi_bwd)


def level_gather_interp(table: jnp.ndarray, gidx: jnp.ndarray,
                        w: jnp.ndarray) -> jnp.ndarray:
    """Single-level convenience wrapper: sum_c w[:,c,None]*table[gidx[:,c]]."""
    return grouped_gather_interp(table, gidx, w, 1, table.shape[-1])
