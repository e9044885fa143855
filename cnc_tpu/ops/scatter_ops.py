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

_SCAN_CHUNK = 1 << 21


def _chunked_segment_inclusive_cols(cols, keys: jnp.ndarray):
    """Segmented inclusive sums over sorted contiguous keys for several 1-D
    value columns at once, chunked so no associative_scan spans more than
    _SCAN_CHUNK elements (larger single scans OOM the TPU compiler).  Chunk
    carries propagate the running sums of the boundary-crossing segment."""
    n = keys.shape[0]
    f = len(cols)

    def comb(a, b):
        fa, va = a[0], a[1:]
        fb, vb = b[0], b[1:]
        return (fa | fb,) + tuple(jnp.where(fb, y, x + y)
                                  for x, y in zip(va, vb))

    if n <= _SCAN_CHUNK:
        head = jnp.concatenate([jnp.ones((1,), bool), keys[1:] != keys[:-1]])
        out = jax.lax.associative_scan(comb, (head,) + tuple(cols))
        return out[1:]

    c = -(-n // _SCAN_CHUNK)
    pad = c * _SCAN_CHUNK - n
    kp = jnp.pad(keys, (0, pad), constant_values=keys[-1]).reshape(
        c, _SCAN_CHUNK)
    vr = tuple(jnp.pad(x, (0, pad)).reshape(c, _SCAN_CHUNK) for x in cols)

    def body(carry, inp):
        carry_key, carry_sums = carry
        kb = inp[0]
        vb = inp[1:]
        head = jnp.concatenate([jnp.ones((1,), bool), kb[1:] != kb[:-1]])
        out = jax.lax.associative_scan(comb, (head,) + vb)
        vs = out[1:]
        in_carry = (jnp.cumsum(head.astype(jnp.int32)) == 1) & \
            (kb[0] == carry_key)
        vs = tuple(v + jnp.where(in_carry, cs, 0.0)
                   for v, cs in zip(vs, carry_sums))
        return (kb[-1], tuple(v[-1] for v in vs)), vs

    (_, _), outs = jax.lax.scan(
        body, (keys[0] - 1, tuple(jnp.zeros((), x.dtype) for x in cols)),
        (kp,) + vr)
    return tuple(o.reshape(-1)[:n] for o in outs)


_SORT_CHUNK = 1 << 22


def _densify_one(cols, idx, size):
    # sentinel row per output entry so every entry has a run tail
    keys = jnp.concatenate([idx.astype(jnp.int32),
                            jnp.arange(size, dtype=jnp.int32)])
    ext = tuple(jnp.concatenate([x, jnp.zeros((size,), x.dtype)])
                for x in cols)
    sorted_arrs = jax.lax.sort((keys,) + ext, num_keys=1)
    skeys = sorted_arrs[0]
    sums = _chunked_segment_inclusive_cols(sorted_arrs[1:], skeys)
    tail = jnp.concatenate([skeys[1:] != skeys[:-1], jnp.ones((1,), bool)])
    # exactly `size` tails (every entry has a sentinel); compact via gathers
    c = jnp.cumsum(tail.astype(jnp.int32))
    tpos = jnp.searchsorted(c, jnp.arange(1, size + 1, dtype=jnp.int32))
    return tuple(s[tpos] for s in sums)


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
