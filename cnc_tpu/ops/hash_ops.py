"""Spatial hashing for multiresolution hash grids.

Bit-parity port of the reference hash semantics (gridencoder/src/
gridencoder.cu:45-87 `fast_hash` / `get_grid_index`), expressed in vectorized
JAX uint32 arithmetic: products wrap mod 2**32 exactly like CUDA uint32, XOR is
bitwise, and the final modulus is taken against the level's table size.

Because hashed levels always have power-of-two table sizes (2**log2_hashmap_size)
and dense levels never hash, the uint32 result matches the reference's
host-side int64 implementation (examples/utils.py:492-511) bit for bit — the
property the codec's vertex->entry tables rely on.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

# gridencoder.cu:49
PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437,
          2165219737)


def fast_hash(pos_grid: jnp.ndarray) -> jnp.ndarray:
    """XOR-prime hash over integer lattice coords.

    Args:
      pos_grid: [..., D] non-negative integer coords (any int dtype).
    Returns:
      [...] uint32 hash values.
    """
    pg = pos_grid.astype(jnp.uint32)
    d = pg.shape[-1]
    result = jnp.zeros(pg.shape[:-1], dtype=jnp.uint32)
    for i in range(d):
        result = result ^ (pg[..., i] * jnp.uint32(PRIMES[i]))
    return result


def dense_index(pos_grid: jnp.ndarray, resolution) -> jnp.ndarray:
    """Row-major index: x + y*R + z*R^2 (gridencoder.cu:72-77).

    `resolution` may be a python int or a per-point array (mixed levels).
    """
    pg = pos_grid.astype(jnp.uint32)
    if not isinstance(resolution, (int, np.integer)):
        resolution = resolution.astype(jnp.uint32)
    d = pg.shape[-1]
    idx = jnp.zeros(pg.shape[:-1], dtype=jnp.uint32)
    stride = jnp.ones(pg.shape[:-1], dtype=jnp.uint32) if not isinstance(
        resolution, (int, np.integer)) else 1
    if isinstance(resolution, (int, np.integer)):
        r = np.uint32(resolution)
        s = np.uint32(1)
        for i in range(d):
            idx = idx + pg[..., i] * s
            s = np.uint32(s * r)  # wraps like uint32; fine (dense => small)
        return idx
    for i in range(d):
        idx = idx + pg[..., i] * stride
        stride = stride * resolution
    return idx


def grid_index(pos_grid: jnp.ndarray, resolution, hashmap_size) -> jnp.ndarray:
    """Level-local entry index for lattice coords (gridencoder.cu:61-87).

    Dense row-major indexing when resolution**D <= hashmap_size, spatial hash
    otherwise; result is taken mod hashmap_size either way.

    Args:
      pos_grid: [..., D] integer coords.
      resolution: int or [...] per-point array.
      hashmap_size: int or [...] per-point array (level table size).
    Returns:
      [...] int32 index in [0, hashmap_size).
    """
    d = pos_grid.shape[-1]
    if isinstance(resolution, (int, np.integer)) and isinstance(
            hashmap_size, (int, np.integer)):
        if resolution ** d <= hashmap_size:
            # dense index < R**D <= hashmap_size: the reference's final
            # `% hashmap_size` is an identity here (gridencoder.cu:85)
            return dense_index(pos_grid, resolution).astype(jnp.int32)
        idx = fast_hash(pos_grid)
        if hashmap_size & (hashmap_size - 1) == 0:
            return (idx & jnp.uint32(hashmap_size - 1)).astype(jnp.int32)
        return (idx % jnp.uint32(hashmap_size)).astype(jnp.int32)
    resolution = jnp.asarray(resolution)
    hashmap_size = jnp.asarray(hashmap_size)
    dense = dense_index(pos_grid, resolution)
    hashed = fast_hash(pos_grid)
    # resolutions are <= 1026 so R**3 fits int32 (max 514**3 < 2**31)
    use_dense = (resolution.astype(jnp.int32) ** d) <= hashmap_size.astype(jnp.int32)
    # hashed levels always size their tables at 2**log2_hashmap_size
    # (GridSpec.level_sizes / ngp.py:201-208), so the modulus is a bit mask;
    # dense indices are already < hashmap_size.  This avoids uint32 `%` by a
    # non-constant divisor, which XLA expands to a long op sequence per point.
    masked = hashed & (hashmap_size.astype(jnp.uint32) - 1)
    return jnp.where(use_dense, dense, masked).astype(jnp.int32)


def grid_index_np(pos_grid: np.ndarray, resolution: int,
                  hashmap_size: int) -> np.ndarray:
    """NumPy oracle for host-side table construction (examples/utils.py:492-511).

    Used to build the per-level vertex->entry tables at init; must agree with
    `grid_index` exactly.
    """
    pg = pos_grid.astype(np.uint32)
    d = pg.shape[-1]
    if resolution ** d <= hashmap_size:
        idx = np.zeros(pg.shape[:-1], dtype=np.uint32)
        stride = np.uint32(1)
        for i in range(d):
            idx = idx + pg[..., i] * stride
            stride = np.uint32(stride * np.uint32(resolution))
    else:
        idx = np.zeros(pg.shape[:-1], dtype=np.uint32)
        with np.errstate(over="ignore"):
            for i in range(d):
                idx = idx ^ (pg[..., i] * np.uint32(PRIMES[i]))
    return (idx % np.uint32(hashmap_size)).astype(np.int64)
