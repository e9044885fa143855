"""Pallas/Mosaic VMEM-resident scatter-add for hash-table gradients.

The hash-encode backward accumulates ``d_table[idx] += w * g`` for ~10^8
(index, feature-row) pairs per training step; XLA's 1-D column scatter-add
floor is ~8-10 ns/update x F columns (ops/scatter_ops.py).  Mosaic cannot
gather/scatter along the SUBLANE axis, but a dynamic LANE read-modify-write
(``acc[:, e] += v``) is expressible — so a TRANSPOSED per-level table
``[8, T]`` whose entries live in lanes supports a serial scatter-add that
touches all F feature sublanes in one update (reference op being replaced:
gridencoder.cu:399-585 kernel_grid_backward).

Feasibility and the ns/row figure are measured by tools/pallas_probe.py on
real hardware; this module is the production path, gated OFF by default
(``enabled()``) until the probe shows a win.  Correctness is validated in
interpret mode on CPU (tests/test_pallas_scatter.py).

Constraints that shape the kernel:
  * VMEM is ~16 MB/core: a full 2^19-entry transposed f32 level ([8, 2^19]
    = 16 MB) does not fit next to the input stream blocks, so levels larger
    than ``_T_BLOCK`` entries are processed in table-block passes — the
    grid's first axis walks table blocks, and each pass re-streams the whole
    index/value stream, applying only in-range updates.
  * The value stream carries all F feature rows in sublanes (zeros above F)
    so one RMW updates a full table row.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Table-block size in entries: [8, _T_BLOCK] f32 = 8 MB of VMEM, leaving
# room for the streamed idx/val blocks and their double buffers.
_T_BLOCK = 1 << 18
# Index/value stream block (lanes): [8, _N_BLOCK] f32+i32 = 0.5 MB/buffer.
_N_BLOCK = 1 << 13

_ENV_FLAG = "CNC_PALLAS_SCATTER"


def enabled() -> bool:
    """Production gate: CNC_PALLAS_SCATTER=1 turns the Pallas backward on.

    Default off until tools/pallas_probe.py measures a win on hardware over
    the XLA column-scatter floor.
    """
    return bool(int(os.environ.get(_ENV_FLAG, "0")))


def interpret_mode() -> bool:
    """CNC_PALLAS_INTERPRET=1 runs the kernels through the Pallas
    interpreter — correctness validation on CPU (tests)."""
    return bool(int(os.environ.get("CNC_PALLAS_INTERPRET", "0")))


def block_sizes() -> Tuple[int, int]:
    """(n_block, t_block), overridable via CNC_PALLAS_NBLOCK/TBLOCK so
    interpret-mode tests can keep the serial loop tiny."""
    return (int(os.environ.get("CNC_PALLAS_NBLOCK", _N_BLOCK)),
            int(os.environ.get("CNC_PALLAS_TBLOCK", _T_BLOCK)))


def _scatter_kernel(idx_ref, val_ref, out_ref):
    """Serial RMW: out[:, idx[i] - block_base] += val[:, i] for in-block idx.

    idx_ref carries GLOBAL entry ids (same id broadcast across sublanes);
    the grid's first axis selects which _T_BLOCK-entry window of the level
    this pass owns.
    """
    nb = idx_ref.shape[1]
    base = pl.program_id(0) * out_ref.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        e = idx_ref[0, i] - base
        in_blk = (e >= 0) & (e < out_ref.shape[1])

        @pl.when(in_blk)
        def _():
            out_ref[:, e] += val_ref[:, i]

        return 0

    jax.lax.fori_loop(0, nb, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("size", "interpret", "n_block",
                                    "t_block"))
def scatter_add_table(idx: jnp.ndarray, vals8: jnp.ndarray, size: int,
                      interpret: bool = False, n_block: int = _N_BLOCK,
                      t_block: int = _T_BLOCK) -> jnp.ndarray:
    """out[f, e] = sum_{i: idx[i]==e} vals8[f, i]  (out shape [8, size]).

    idx: [N] int32 level-local entry ids; out-of-range ids are dropped.
    vals8: [8, N] f32 — feature rows in sublanes (zero-pad unused rows).
    N is padded to a multiple of the stream block internally (with
    out-of-range indices, so padding contributes nothing).  n_block/t_block
    exist for interpret-mode tests; production uses the defaults.
    """
    n = idx.shape[0]
    nb = -(-n // n_block) * n_block
    if nb != n:
        idx = jnp.pad(idx, (0, nb - n), constant_values=-1)
        vals8 = jnp.pad(vals8, ((0, 0), (0, nb - n)))
    idx8 = jnp.broadcast_to(idx[None, :], (8, nb))

    t_blocks = -(-size // t_block)
    t_pad = t_blocks * t_block
    out = pl.pallas_call(
        _scatter_kernel,
        out_shape=jax.ShapeDtypeStruct((8, t_pad), jnp.float32),
        grid=(t_blocks, nb // n_block),
        in_specs=[
            pl.BlockSpec((8, n_block), lambda tb, ib: (0, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_block), lambda tb, ib: (0, ib),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, t_block), lambda tb, ib: (0, tb),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx8, vals8)
    return out[:, :size]


def grouped_table_grad(g: jnp.ndarray, gidx2: jnp.ndarray, w2: jnp.ndarray,
                       groups: int, f: int, t_total: int,
                       group_spans: Sequence[Tuple[int, int]],
                       interpret: bool = False, n_block: int = _N_BLOCK,
                       t_block: int = _T_BLOCK) -> jnp.ndarray:
    """d_table for grouped_gather_interp via per-group Pallas scatters.

    Requires static per-group table spans (offset, size) — i.e. the
    static-level encode path where group == level and every index of group
    gi lies in [off_gi, off_gi + size_gi) or is a masked corner (global id 0
    with weight 0, harmless wherever it lands: its contribution is 0).

    g: [N, G*F] upstream cotangent; gidx2/w2: [N, G*C] as in
    grouped_gather_interp.  Returns d_table [t_total, F] f32.
    """
    n, k = gidx2.shape
    c = k // groups
    d_table = jnp.zeros((t_total, f), jnp.float32)
    for gi, (off, sz) in enumerate(group_spans):
        blk_w = w2[:, gi * c:(gi + 1) * c]                    # [N, C]
        # vals8[fi] = (g[:, gi*F+fi, None] * blk_w).ravel()   # [N*C]
        rows = [(g[:, gi * f + fi][:, None] * blk_w).reshape(-1)
                for fi in range(f)]
        rows += [jnp.zeros_like(rows[0])] * (8 - f)
        vals8 = jnp.stack(rows, axis=0)                       # [8, N*C]
        idx = gidx2[:, gi * c:(gi + 1) * c].reshape(-1) - off  # level-local
        acc = scatter_add_table(idx, vals8, sz, interpret=interpret,
                                n_block=n_block, t_block=t_block)
        d_table = jax.lax.dynamic_update_slice(
            d_table, acc[:f].T, (off, 0))
    return d_table
