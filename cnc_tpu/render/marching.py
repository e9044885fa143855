"""Occupancy-guided ray marching with static-shape compaction.

TPU-native replacement for the reference's ragged DDA traversal
(nerfacc/cuda/csrc/grid.cu:68-510 `traverse_grids_kernel`, two-pass
count-then-fill).  XLA needs static shapes, so instead of emitting ragged
per-ray sample lists we:

  1. march every ray on a fixed t-lattice (stratified near-plane jitter like
     occ_grid.py:172-173), testing each midpoint against the binary occupancy
     grid — a pure gather, no control flow;
  2. compact the (ray, step) hits into a fixed-capacity sample buffer with
     one cumsum + unique-index scatter (scatter_ops.compact_mask_indices:
     slot j holds the position of the j-th set bit), keeping samples sorted
     by (ray, t) so downstream volume rendering is a plain contiguous
     segment scan.

Samples are midpoints of [t, t+dt] intervals, matching how the reference's
renderers consume traversal output (utils.py:118 midpoint positions).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..ops import scatter_ops


class RaySamples(NamedTuple):
    """Compacted sample buffer (the TPU analogue of nerfacc RaySamples,
    data_specs.py:91)."""
    ray_id: jnp.ndarray    # [cap] int32, sorted ascending
    t_mid: jnp.ndarray     # [cap] float32 midpoint distance
    dt: jnp.ndarray        # scalar step size
    valid: jnp.ndarray     # [cap] bool
    num_samples: jnp.ndarray  # scalar int32 (hits before truncation)


def ray_aabb_intersect(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                       aabb: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab test (nerfacc grid.cu:513-555 / grid.py:55-91). Returns (tmin,tmax);
    tmin > tmax means miss."""
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-10,
                            jnp.where(rays_d >= 0, 1e-10, -1e-10), rays_d)
    t0 = (aabb[:3] - rays_o) * inv_d
    t1 = (aabb[3:] - rays_o) * inv_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return tmin, tmax


def occupancy_lookup(pos: jnp.ndarray, binaries: jnp.ndarray,
                     aabb: jnp.ndarray) -> jnp.ndarray:
    """Binary-grid membership of world positions (inside-aabb AND occupied)."""
    res = binaries.shape[0]
    lo, hi = aabb[:3], aabb[3:]
    x01 = (pos - lo) / (hi - lo)
    inside = jnp.all((x01 >= 0.0) & (x01 < 1.0), axis=-1)
    vox = jnp.clip((x01 * res).astype(jnp.int32), 0, res - 1)
    flat = (vox[..., 0] * res + vox[..., 1]) * res + vox[..., 2]
    occ = binaries.reshape(-1)[flat]
    return occ & inside


def march_rays(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
               binaries: jnp.ndarray, aabb: jnp.ndarray,
               key: Optional[jnp.ndarray],
               cfg: RenderConfig, capacity: int,
               ray_mask: Optional[jnp.ndarray] = None,
               t_start: Optional[jnp.ndarray] = None,
               max_steps: Optional[int] = None) -> RaySamples:
    """March rays through the occupancy grid and compact hits.

    Args:
      rays_o/rays_d: [R, 3].
      key: PRNG key for stratified near jitter (None = deterministic eval).
      capacity: static output buffer size.
      ray_mask: optional [R] bool; masked-out rays yield no samples.
      t_start: optional [R] per-ray start distance (resuming eval marches).
      max_steps: static steps per ray (default cfg.max_march_steps).
    Returns:
      RaySamples with per-(ray,t)-sorted compacted hits.
    """
    r = rays_o.shape[0]
    s = max_steps or cfg.max_march_steps
    dt = cfg.render_step_size

    tmin, tmax = ray_aabb_intersect(rays_o, rays_d, aabb)
    tmin = jnp.maximum(tmin, cfg.near_plane)
    tmax = jnp.minimum(tmax, cfg.far_plane)
    if t_start is not None:
        tmin = jnp.maximum(tmin, t_start)
    if key is not None:
        tmin = tmin + jax.random.uniform(key, (r,)) * dt
    hit = tmin < tmax
    if ray_mask is not None:
        hit = hit & ray_mask

    # occupancy bits for every (ray, step) midpoint — the only O(R*S) pass
    steps = jnp.arange(s, dtype=jnp.float32) + 0.5
    t = tmin[:, None] + steps[None, :] * dt                    # [R, S]
    pos = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
    bits = occupancy_lookup(pos, binaries, aabb)
    bits = bits & (t < tmax[:, None]) & hit[:, None]

    # slot j <- index of the (j+1)-th set bit; one 1-D scatter (see
    # scatter_ops.compact_mask_indices — faster than the searchsorted
    # gather compaction it replaced)
    src, total = scatter_ops.compact_mask_indices(bits.reshape(-1), capacity)
    valid = jnp.arange(capacity) < jnp.minimum(total, capacity)
    ray_id = (src // s).astype(jnp.int32)
    step_id = (src % s).astype(jnp.int32)
    t_mid = tmin[ray_id] + (step_id.astype(jnp.float32) + 0.5) * dt
    ray_id = jnp.where(valid, ray_id, r - 1)  # park padding on last ray
    return RaySamples(ray_id=ray_id, t_mid=t_mid,
                      dt=jnp.float32(dt), valid=valid, num_samples=total)


def sample_positions(samples: RaySamples, rays_o: jnp.ndarray,
                     rays_d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World positions + unit dirs for compacted samples."""
    o = rays_o[samples.ray_id]
    d = rays_d[samples.ray_id]
    return o + d * samples.t_mid[:, None], d
