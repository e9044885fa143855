"""Table scatter-add and the fused hash-grid gather/interp op.

Two TPU measurements (v5e via axon, f32) shape this module:

  * XLA's scatter-add over 1-D f32 COLUMNS is fast (~8-10 ns/update at
    8M-50M updates, compile <1s) while ROW scatters ([N, 4] rows into
    [T, 4]) are ~9x slower per update, and the earlier sort/segmented-scan
    "scatter-free" designs cost minutes of TPU compile (a 5-tuple
    associative_scan alone was ~260s) for no runtime win.  Gradient
    accumulation into the hash tables is therefore one plain per-feature
    column scatter-add.
  * compute ops force (8,128)-tiled layout copies, so any big array with a
    tiny minor dimension pads brutally (observed: an [35M, 4] f32 stack
    copied to 18GB).  Every large intermediate here is therefore a 1-D array
    (one per feature column) or a [N, >=96] 2-D array; features interleave
    only at small boundaries via static column permutations.

`grouped_gather_interp` covers ALL levels of a multiresolution encode in one
custom-vjp op so both directions stay in this layout regime.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def scatter_add_cols(cols, idx: jnp.ndarray, size: int):
    """Per-column zeros([size]).at[idx].add(col).

    cols: sequence of [N] 1-D float arrays sharing idx ([N] int32 in
    [0, size); out-of-range rows are dropped).  Returns a tuple of [size]
    1-D accumulations.  Plain XLA scatter-add per column — measured at
    ~8-10 ns/update on TPU v5e, ~9x faster than scattering [N, F] rows.
    """
    return tuple(
        jnp.zeros((size,), c.dtype).at[idx].add(c, mode="drop") for c in cols)


def scatter_add(vals: jnp.ndarray, idx: jnp.ndarray, size: int) -> jnp.ndarray:
    """Equivalent of zeros([size, F]).at[idx].add(vals), column-wise."""
    f = vals.shape[1]
    outs = scatter_add_cols(tuple(vals[:, i] for i in range(f)), idx, size)
    return jnp.stack(outs, axis=-1)


# Backwards-compatible aliases (the sort-based implementations these names
# referred to were replaced by plain column scatters — see module docstring).
scatter_add_sorted_cols = scatter_add_cols
scatter_add_sorted = scatter_add


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def grouped_gather_interp(table: jnp.ndarray, gidx2: jnp.ndarray,
                          w2: jnp.ndarray, groups: int, f: int,
                          need_dw: bool = True) -> jnp.ndarray:
    """out[n, g*F+fi] = sum_c w2[n, g*C+c] * table[gidx2[n, g*C+c], fi].

    table: [T, F]; gidx2/w2: [N, G*C] (corner-major within each group).
    Returns [N, G*F] level-major feature blocks.

    Forward is one ROW gather + fused einsum reduce: a width-F row gather
    costs the same ~7 ns per INDEX as a 1-element gather on TPU v5e, so this
    is Fx fewer index ops than per-feature column gathers (measured 5.2x
    end-to-end at render scale; XLA fuses the [N, K, F] intermediate into
    the reduction).  The custom bwd keeps d_table as per-feature COLUMN
    scatters — a row scatter is ~9x slower per update.

    need_dw=False skips the d_w cotangent (a full N*K corner re-gather plus
    einsums): CNC never differentiates w.r.t. sample positions (no pose
    optimization; context lattice points are integers), so every encode call
    in the hot path passes False.

    A Pallas serial lane-RMW alternative backward (VMEM-resident [8, T]
    transposed tables) was carried through round 3 gated off; on real v5e
    hardware Mosaic rejects even a minimal dynamic-lane RMW kernel
    (tools/pallas_scatter_probe_r4.py, 2026-08-19: tpu_compile_helper
    crash at every table size), so the XLA column scatter at ~7 ns/update
    (28 ns per F=4 row) stands as the measured hardware floor and the
    Pallas module was deleted.
    """
    n, k = gidx2.shape
    c = k // groups
    feats = jnp.take(table, gidx2, axis=0, mode="clip")   # [N, K, F]
    # per-group 3-D einsums, NOT one 4-D [N,G,C,F] einsum: the 4-D reshape
    # materializes with (8,128) tiling over the two tiny minor dims — a
    # 3.2 GB logical array padded to 64 GB (observed compile-time OOM)
    outs = []
    for g in range(groups):
        blk_w = w2[:, g * c:(g + 1) * c]                  # [N, C]
        blk_f = feats[:, g * c:(g + 1) * c]               # [N, C, F]
        outs.append(jnp.einsum("nc,ncf->nf", blk_w, blk_f))
    return jnp.concatenate(outs, axis=1)                  # [N, G*F]


def _ggi_fwd(table, gidx2, w2, groups, f, need_dw):
    return (grouped_gather_interp(table, gidx2, w2, groups, f, need_dw),
            (table, gidx2, w2))


def _ggi_bwd(groups, f, need_dw, res, g):
    table, gidx2, w2 = res
    n, k = gidx2.shape
    c = k // groups
    t = table.shape[0]
    gflat = gidx2.reshape(-1)
    # d_table via per-feature 1-D column scatters; all big intermediates stay
    # [N, K] 2-D (no [N,G,C,F] reshapes — see forward)
    d_cols = []
    for fi in range(f):
        parts = [g[:, gi * f + fi][:, None] * w2[:, gi * c:(gi + 1) * c]
                 for gi in range(groups)]
        col = jnp.concatenate(parts, axis=1).reshape(-1)    # [N*K]
        d_cols.append(jnp.zeros((t,), col.dtype).at[gflat].add(
            col, mode="drop"))
    d_table = jnp.stack(d_cols, axis=-1)              # [T, F] (small boundary)
    if not need_dw:
        return d_table, None, jnp.zeros_like(w2)
    return d_table, None, _ggi_dw(table, gidx2, w2, groups, f, g)


def _ggi_dw(table, gidx2, w2, groups, f, g):
    """d_w[n, g*C+c] = sum_f g[n, g*F+f] * table[gidx, f] — one row gather."""
    c = gidx2.shape[1] // groups
    feats = jnp.take(table, gidx2, axis=0, mode="clip")     # [N, K, F]
    dw_parts = []
    for gi in range(groups):
        gg = g[:, gi * f:(gi + 1) * f]                      # [N, F]
        blk_f = feats[:, gi * c:(gi + 1) * c]               # [N, C, F]
        dw_parts.append(jnp.einsum("nf,ncf->nc", gg, blk_f))
    return jnp.concatenate(dw_parts, axis=1)                # [N, K]


grouped_gather_interp.defvjp(_ggi_fwd, _ggi_bwd)


def level_gather_interp(table: jnp.ndarray, gidx: jnp.ndarray,
                        w: jnp.ndarray) -> jnp.ndarray:
    """Single-level convenience wrapper: sum_c w[:,c,None]*table[gidx[:,c]]."""
    return grouped_gather_interp(table, gidx, w, 1, table.shape[-1])


def compact_mask_indices(mask: jnp.ndarray, cap: int):
    """Positions of the first `cap` set bits of mask, ascending.

    Returns (src [cap] int32 — position of the j-th set bit, 0-filled beyond
    the count; count scalar int32).  One 1-D scatter (~10 ns/update on TPU
    v5e) instead of the cumsum+searchsorted gather compaction this replaces:
    cap binary searches over an n-element array cost ~log(n) random gathers
    per query, which measured several times slower at multi-million scale.
    """
    n = mask.shape[0]
    c = jnp.cumsum(mask.astype(jnp.int32))
    count = c[-1]
    pos = jnp.where(mask & (c <= cap), c - 1, cap)
    src = jnp.zeros((cap,), jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True)
    return src, count
