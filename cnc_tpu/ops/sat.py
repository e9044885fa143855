"""Summed-area-table occupancy queries.

TPU-native replacement for the reference's per-corner scan loops over the
128^D occupancy grid:

  * corner masking inside the hash-grid encoder (gridencoder.cu:222-276),
  * `query_mask_3D` / `_qlist` mask + overlap-area pooling
    (my_cuda_backen/aligner_kernel.cu:4-326).

Instead of walking up to (2t+2)^3 cells per corner like the CUDA kernels, we
precompute an integer summed-area table once per occupancy update; a box-"any"
query is then 2^D exact int32 gathers, and the fractional overlap volume is an
inclusion–exclusion of the D-linearly interpolated SAT (the integral function
of a piecewise-constant field is exactly its multilinear-interpolated SAT).
Interpolation is locally rebased to an integer baseline so float32 precision
holds even at 128^3 cell counts.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def build_sat(binary: jnp.ndarray) -> jnp.ndarray:
    """Integer SAT of a D-dim boolean grid; output shape = grid.shape + 1."""
    s = binary.astype(jnp.int32)
    for ax in range(s.ndim):
        s = jnp.cumsum(s, axis=ax)
        pad = [(0, 0)] * s.ndim
        pad[ax] = (1, 0)
        s = jnp.pad(s, pad)
    return s


def _gather_sat(sat: jnp.ndarray, idx: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """sat[idx0, idx1, ...] with broadcasted integer index arrays."""
    return sat[tuple(idx)]


def box_count(sat: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Number of set cells in the inclusive index box [lo, hi] per point.

    Args:
      sat: [R+1]*D int32 summed-area table.
      lo, hi: [..., D] int32 cell indices, assumed clipped to [0, R-1].
    Returns:
      [...] int32 counts.
    """
    d = lo.shape[-1]
    total = None
    for s in range(1 << d):
        idx = []
        sign = 1
        for ax in range(d):
            if s & (1 << ax):
                idx.append(lo[..., ax])
                sign = -sign
            else:
                idx.append(hi[..., ax] + 1)
        term = _gather_sat(sat, tuple(idx))
        total = term * sign if total is None else total + term * sign
    return total


def footprint_box(corners: jnp.ndarray, resolution, rb: int):
    """Quantized footprint of a grid corner on the Rb occupancy grid.

    Matches gridencoder.cu:224-241 / aligner_kernel.cu:24-41: the corner at
    lattice coord c of a resolution-R grid has normalized center
    pn = (c - 0.5)/(R-2) and half-width 1/(R-2); both edges are scaled by Rb,
    clamped to [0, Rb-1] and truncated to ints.

    Args:
      corners: [..., D] integer (or float) lattice coords.
      resolution: python int or per-point array [...] (qlist variant).
      rb: occupancy grid resolution.
    Returns:
      (lo, hi): [..., D] int32 inclusive cell index box.
    """
    c = corners.astype(jnp.float32)
    if isinstance(resolution, (int, np.integer)):
        scale_re = jnp.float32(1.0 / (resolution - 2.0))
    else:
        scale_re = (1.0 / (resolution.astype(jnp.float32) - 2.0))[..., None]
    pn = (c - 0.5) * scale_re
    lo = jnp.clip((pn - scale_re) * rb, 0, rb - 1).astype(jnp.int32)
    hi = jnp.clip((pn + scale_re) * rb, 0, rb - 1).astype(jnp.int32)
    return lo, hi


def occupancy_mask(sat: jnp.ndarray, corners: jnp.ndarray, resolution,
                   rb: int) -> jnp.ndarray:
    """True where any occupied cell overlaps the corner footprint."""
    lo, hi = footprint_box(corners, resolution, rb)
    return box_count(sat, lo, hi) > 0


def _interp_sat_rebased(sat: jnp.ndarray, u: Tuple[jnp.ndarray, ...],
                        base_idx: Tuple[jnp.ndarray, ...],
                        base_val: jnp.ndarray) -> jnp.ndarray:
    """Multilinear interp of (sat - base_val) at continuous coords u.

    Rebasing keeps the interpolated magnitudes small (bounded by the local SAT
    variation) so float32 stays accurate despite counts up to Rb^3.
    """
    d = len(u)
    i0 = [jnp.clip(jnp.floor(ui), 0, sat.shape[ax] - 2).astype(jnp.int32)
          for ax, ui in enumerate(u)]
    f = [ui - i0[ax] for ax, ui in enumerate(u)]
    out = None
    for s in range(1 << d):
        idx = []
        w = None
        for ax in range(d):
            bit = (s >> ax) & 1
            idx.append(i0[ax] + bit)
            wax = f[ax] if bit else (1.0 - f[ax])
            w = wax if w is None else w * wax
        val = (_gather_sat(sat, tuple(idx)) - base_val).astype(jnp.float32)
        term = w * val
        out = term if out is None else out + term
    return out


def overlap_volume_cells(sat: jnp.ndarray, corners: jnp.ndarray, resolution,
                         rb: int) -> jnp.ndarray:
    """Occupied volume overlapping the corner footprint, in cell^D units.

    Continuous-integral formulation of aligner_kernel.cu's per-cell
    accumulation: integrate the occupancy indicator over the footprint box
    clipped to [0,1]^D, times Rb^D.  Matches the CUDA result up to float
    association order (both sides of the codec use this implementation, so
    encode/decode stay consistent).
    """
    d = corners.shape[-1]
    c = corners.astype(jnp.float32)
    if isinstance(resolution, (int, np.integer)):
        scale_re = jnp.float32(1.0 / (resolution - 2.0))
    else:
        scale_re = (1.0 / (resolution.astype(jnp.float32) - 2.0))[..., None]
    pn = (c - 0.5) * scale_re
    a = jnp.clip(pn - scale_re, 0.0, 1.0) * rb   # cell units
    b = jnp.clip(pn + scale_re, 0.0, 1.0) * rb

    base_idx = tuple(jnp.clip(a[..., ax].astype(jnp.int32), 0, rb - 1)
                     for ax in range(d))
    base_val = _gather_sat(sat, base_idx)

    total = None
    for s in range(1 << d):
        u = []
        sign = 1
        for ax in range(d):
            if s & (1 << ax):
                u.append(a[..., ax])
                sign = -sign
            else:
                u.append(b[..., ax])
        term = _interp_sat_rebased(sat, tuple(u), base_idx, base_val)
        total = term * sign if total is None else total + term * sign
    return total


def overlap_area_pool_int(sat: jnp.ndarray, corners: jnp.ndarray, resolution,
                          rb: int) -> jnp.ndarray:
    """int(overlap * 1000) like aligner_kernel.cu:79/241."""
    v = overlap_volume_cells(sat, corners, resolution, rb)
    return jnp.maximum(v * 1000.0, 0.0).astype(jnp.int32)
