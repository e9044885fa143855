"""Scatter-free scatter-add and the fused hash-grid gather/interp op.

Two TPU constraints shape this module:

  * XLA serializes scatter ops (~65ns/element even with unique indices —
    measured), so a training step's ~25M table-gradient updates would cost
    seconds.  Dense accumulations are built WITHOUT any scatter: one
    `lax.sort` of the updates plus one sentinel row per table entry, a
    chunked segmented scan, and a cumsum+searchsorted compaction of the run
    tails (all gathers).
  * arrays are tiled (8, 128): any big tensor with tiny minor dimensions
    (e.g. [N, levels, corners, features] = [*, 12, 8, 4]) pads 17-32x and
    OOMs HBM.  All internals here are 1-D or [N, >=96]-shaped 2-D, and the
    feature gather is element-level from a flattened [T*F] table.

`grouped_gather_interp` covers ALL levels of a multiresolution encode in one
op so the backward runs a SINGLE merge-densify sort — per-level ops emitted
one huge bitonic sort each and blew up the TPU compiler.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_SCAN_CHUNK = 1 << 21


def _chunked_segment_inclusive(vals: jnp.ndarray, keys: jnp.ndarray
                               ) -> jnp.ndarray:
    """Segmented inclusive sum over sorted contiguous keys, chunked so the
    associative_scan never spans more than _SCAN_CHUNK elements (larger
    single scans can OOM the TPU compiler).  Chunk carries propagate the
    running sum of the segment that crosses the boundary."""
    n, f = vals.shape
    if n <= _SCAN_CHUNK:
        head = jnp.concatenate([jnp.ones((1,), bool), keys[1:] != keys[:-1]])

        def comb(a, b):
            (va, fa), (vb, fb) = a, b
            return jnp.where(fb[:, None], vb, va + vb), fa | fb

        out, _ = jax.lax.associative_scan(comb, (vals, head))
        return out
    c = -(-n // _SCAN_CHUNK)
    pad = c * _SCAN_CHUNK - n
    vp = jnp.pad(vals, ((0, pad), (0, 0)))
    kp = jnp.pad(keys, (0, pad), constant_values=keys[-1])
    vr = vp.reshape(c, _SCAN_CHUNK, f)
    kr = kp.reshape(c, _SCAN_CHUNK)

    def body(carry, inp):
        carry_key, carry_sum = carry
        vb, kb = inp
        head = jnp.concatenate([jnp.ones((1,), bool), kb[1:] != kb[:-1]])

        def comb(a, b):
            (va, fa), (vb_, fb) = a, b
            return jnp.where(fb[:, None], vb_, va + vb_), fa | fb

        vs, _ = jax.lax.associative_scan(comb, (vb, head))
        # elements still in the carried-over segment get the carry added
        in_carry = jnp.cumsum(head.astype(jnp.int32)) == 1
        cont = (kb[0] == carry_key)
        vs = vs + jnp.where((in_carry & cont)[:, None], carry_sum[None, :],
                            0.0)
        return (kb[-1], vs[-1]), vs

    (_, _), out = jax.lax.scan(body, (keys[0] - 1, jnp.zeros((f,),
                                                             vals.dtype)),
                               (vr, kr))
    return out.reshape(c * _SCAN_CHUNK, f)[:n]


def scatter_add_sorted(vals: jnp.ndarray, idx: jnp.ndarray,
                       size: int) -> jnp.ndarray:
    """Equivalent of zeros([size, F]).at[idx].add(vals), scatter-free.

    vals: [N, F] (F small, kept as separate 1-D sort operands so nothing
    pads); idx: [N] int32 in [0, size).
    """
    n, f = vals.shape
    # sentinel row per output entry so every entry has a run tail
    keys = jnp.concatenate([idx.astype(jnp.int32),
                            jnp.arange(size, dtype=jnp.int32)])
    cols = [jnp.concatenate([vals[:, i], jnp.zeros((size,), vals.dtype)])
            for i in range(f)]
    sorted_arrs = jax.lax.sort((keys,) + tuple(cols), num_keys=1)
    skeys = sorted_arrs[0]
    svals = jnp.stack(sorted_arrs[1:], axis=-1)
    sums = _chunked_segment_inclusive(svals, skeys)
    tail = jnp.concatenate([skeys[1:] != skeys[:-1], jnp.ones((1,), bool)])
    # exactly `size` tails (every entry has a sentinel); compact via gathers
    c = jnp.cumsum(tail.astype(jnp.int32))
    tpos = jnp.searchsorted(c, jnp.arange(1, size + 1, dtype=jnp.int32))
    return sums[tpos]


def _elem_indices(gidx2: jnp.ndarray, f: int) -> jnp.ndarray:
    """[N, K] entry indices -> [N, K*F] element indices into the flat table."""
    rep = jnp.repeat(gidx2 * f, f, axis=1)
    off = jnp.tile(jnp.arange(f, dtype=gidx2.dtype), gidx2.shape[1])
    return rep + off[None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def grouped_gather_interp(table_flat: jnp.ndarray, gidx2: jnp.ndarray,
                          w2: jnp.ndarray, groups: int, f: int) -> jnp.ndarray:
    """out[n, g*F+f] = sum_c w2[n, g*C+c] * table_flat[gidx2[n, g*C+c]*F + f].

    table_flat: [T*F] flattened table; gidx2/w2: [N, G*C] (corner-major
    within each group).  Returns [N, G*F].
    """
    n, k = gidx2.shape
    c = k // groups
    feats = table_flat[_elem_indices(gidx2, f)]        # [N, K*F]
    out = jnp.zeros((n, groups * f), feats.dtype)
    for ci in range(c):
        cols = (jnp.arange(groups * f) // f) * (c * f) + ci * f + \
            (jnp.arange(groups * f) % f)
        w_rep = jnp.repeat(w2[:, ci::c], f, axis=1)    # [N, G*F]
        out = out + w_rep * feats[:, cols]
    return out


def _ggi_fwd(table_flat, gidx2, w2, groups, f):
    return (grouped_gather_interp(table_flat, gidx2, w2, groups, f),
            (table_flat, gidx2, w2))


def _ggi_bwd(groups, f, res, g):
    table_flat, gidx2, w2 = res
    n, k = gidx2.shape
    c = k // groups
    # d_table: one merge-densify over all corner updates; build each feature
    # column as a 1-D array (update for (n,g,c,f) = g[n, g*F+f] * w2[n, g*C+c])
    cols_f = []
    for fi in range(f):
        gf = g[:, fi::f]                               # [N, G]
        gf_rep = jnp.repeat(gf, c, axis=1)             # [N, G*C]
        cols_f.append((gf_rep * w2).reshape(-1))       # [N*K] 1-D
    upd = jnp.stack(cols_f, axis=-1)                   # [N*K, F]
    d_flat_rows = scatter_add_sorted(upd, gidx2.reshape(-1),
                                     table_flat.shape[0] // f)  # [T, F]
    d_table = d_flat_rows.reshape(-1)
    # d_w[n, g*C+c] = sum_f g[n, g*F+f] * table[gidx*F+f]
    feats = table_flat[_elem_indices(gidx2, f)]        # [N, K*F]
    d_w = jnp.zeros_like(w2)
    for fi in range(f):
        gf = g[:, fi::f]                               # [N, G]
        gf_rep = jnp.repeat(gf, c, axis=1)             # [N, G*C]
        d_w = d_w + gf_rep * feats[:, fi::f]
    return d_table, None, d_w


grouped_gather_interp.defvjp(_ggi_fwd, _ggi_bwd)


def level_gather_interp(table: jnp.ndarray, gidx: jnp.ndarray,
                        w: jnp.ndarray) -> jnp.ndarray:
    """Single-level convenience wrapper: sum_c w[:,c,None]*table[gidx[:,c]]."""
    f = table.shape[-1]
    return grouped_gather_interp(table.reshape(-1), gidx, w, 1, f)
