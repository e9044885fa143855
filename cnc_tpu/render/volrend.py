"""Volume rendering over compacted sample buffers.

Math follows nerfacc/volrend.py: transmittance from density in log space
(T_i = exp(-sum_{j<i} sigma_j * dt_j), volrend.py:261-263), weights
w_i = T_i * (1 - exp(-sigma_i dt_i)), accumulation by scatter-add
(accumulate_along_rays, volrend.py:485-549).  Samples arrive sorted
per-ray-contiguous from the marcher, so prefix sums are contiguous segment
scans (ops/scan.py) and accumulation is a sorted segment_sum.

Visibility pruning (render_visibility_from_density, volrend.py:424-482) is
expressed as weight masking: samples whose transmittance fell below
early_stop_eps are zeroed; the reference instead drops them and recomputes,
but every dropped sample only precedes other dropped samples, so the results
coincide.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import scan as scan_ops
from .marching import RaySamples


class RenderedRays(NamedTuple):
    rgb: jnp.ndarray       # [R, 3]
    opacity: jnp.ndarray   # [R, 1]
    depth: jnp.ndarray     # [R, 1]
    n_rendering_samples: jnp.ndarray  # scalar: visible samples
    # true occupancy hits before buffer truncation — the dynamic ray batching
    # must use this (adapting on the visible count under a saturated buffer
    # spirals: truncated rays lower the count, which grows the batch further)
    n_marched_samples: jnp.ndarray
    # set by the visibility-pruned training path: first ray whose samples were
    # dropped by buffer overflow (== n_rays when none were); the trainer masks
    # rays at/after it out of the loss instead of training on partial renders
    resume_ray: Optional[jnp.ndarray] = None


def render_weights(sigmas: jnp.ndarray, samples: RaySamples,
                   early_stop_eps: float = 1e-4,
                   prefix_trans: Optional[jnp.ndarray] = None,
                   alpha_thre: float = 0.0
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-sample rendering weights, transmittance, alpha.

    prefix_trans: optional [R] carried transmittance (iterative eval renderer,
    utils.py:440 `prefix_trans = 1 - opacity`).
    alpha_thre: samples with alpha below the threshold are skipped entirely
    (nerfacc's alpha_thre culling, volrend.py/grid.cu — the CNC drivers pin
    it to 0, train_CNC_tank_temples.py:186).
    """
    sdt = jnp.where(samples.valid, sigmas * samples.dt, 0.0)
    alpha = 1.0 - jnp.exp(-sdt)
    if alpha_thre > 0.0:
        keep = alpha >= alpha_thre
        sdt = jnp.where(keep, sdt, 0.0)
        alpha = jnp.where(keep, alpha, 0.0)
    prefix = scan_ops.segment_exclusive_sum(sdt, samples.ray_id)
    trans = jnp.exp(-prefix)
    if prefix_trans is not None:
        trans = trans * prefix_trans[samples.ray_id]
    visible = (trans >= early_stop_eps) & samples.valid
    weights = jnp.where(visible, trans * alpha, 0.0)
    return weights, trans, visible


def composite(rgbs: jnp.ndarray, sigmas: jnp.ndarray, samples: RaySamples,
              n_rays: int, render_bkgd: Optional[jnp.ndarray] = None,
              early_stop_eps: float = 1e-4,
              prefix_trans: Optional[jnp.ndarray] = None,
              alpha_thre: float = 0.0) -> RenderedRays:
    """Full compositing pass (nerfacc `rendering`, volrend.py:14-160)."""
    weights, _, visible = render_weights(sigmas, samples, early_stop_eps,
                                         prefix_trans, alpha_thre)
    seg = samples.ray_id
    rgb = jax.ops.segment_sum(weights[:, None] * rgbs, seg,
                              num_segments=n_rays, indices_are_sorted=True)
    opacity = jax.ops.segment_sum(weights, seg, num_segments=n_rays,
                                  indices_are_sorted=True)[:, None]
    depth = jax.ops.segment_sum(weights * samples.t_mid, seg,
                                num_segments=n_rays,
                                indices_are_sorted=True)[:, None]
    if render_bkgd is not None:
        rgb = rgb + render_bkgd * (1.0 - opacity)
    return RenderedRays(rgb=rgb, opacity=opacity, depth=depth,
                        n_rendering_samples=jnp.sum(visible),
                        n_marched_samples=samples.num_samples)
