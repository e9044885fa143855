"""Scatter-free scatter-add and the fused hash-grid gather/interp op.

XLA TPU serializes scatter ops (~65ns/element even with unique indices —
measured), so a training step's ~25M table-gradient updates cost seconds.
This module produces dense [T, F] accumulations without ANY scatter:

  1. concatenate the N (index, value) updates with T sentinel rows
     (arange(T), 0) so every table entry owns at least one row;
  2. one `lax.sort` of the N+T tuples by index (~5ns/element);
  3. chunked segmented inclusive scan (sums within equal-index runs);
  4. the T run tails ARE the dense gradient in index order — compact them
     with the cumsum+searchsorted gather trick (output slot j reads the
     j-th tail).

`level_gather_interp` wraps a whole level's 2^D-corner weighted gather in a
custom_vjp whose backward uses this path, giving the CUDA
kernel_grid_backward semantics (gridencoder.cu:399-585: atomic scatter-add
of w * grad into touched entries) at sort speed.
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
    """Equivalent of zeros([size, F]).at[idx].add(vals), scatter-free."""
    n, f = vals.shape
    # sentinel row per output entry; sentinels sort before real updates with
    # an equal index is not required — sums are order-independent
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


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def grouped_gather_interp(table: jnp.ndarray, gidx: jnp.ndarray,
                          w: jnp.ndarray) -> jnp.ndarray:
    """out[n, g] = sum_c w[n, g, c] * table[gidx[n, g, c]].

    One op covers ALL levels (groups) of a multiresolution encode so the
    backward runs a SINGLE merge-densify sort over every corner update —
    a per-level op would emit one huge bitonic sort per level and blow up
    the TPU compiler (observed: remote compile OOM at 27 sorts/step).

    table: [T, F]; gidx: [N, G, C] int32 global indices; w: [N, G, C]
    float32 (0 for masked corners).  Returns [N, G, F].
    """
    feats = table[gidx]                      # [N, G, C, F]
    return jnp.einsum("ngc,ngcf->ngf", w, feats)


def _ggi_fwd(table, gidx, w):
    return grouped_gather_interp(table, gidx, w), (table, gidx, w)


def _ggi_bwd(res, g):
    table, gidx, w = res
    n, grp, c = gidx.shape
    f = table.shape[1]
    upd = (g[:, :, None, :] * w[..., None]).reshape(n * grp * c, f)
    d_table = scatter_add_sorted(upd, gidx.reshape(-1), table.shape[0])
    feats = table[gidx]                      # recomputed (cheaper than saving)
    d_w = jnp.einsum("ngf,ngcf->ngc", g, feats)
    return d_table, None, d_w


grouped_gather_interp.defvjp(_ggi_fwd, _ggi_bwd)


def level_gather_interp(table, gidx, w):
    """Single-level convenience wrapper over grouped_gather_interp."""
    return grouped_gather_interp(table, gidx[:, None, :], w[:, None, :])[:, 0]
