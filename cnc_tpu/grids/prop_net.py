"""Proposal-network estimator (Mip-NeRF-360-style PDF sampling).

Functional port of nerfacc's PropNetEstimator (nerfacc/estimators/
prop_net.py:17-313).  Present in the reference library but unused by the CNC
drivers (SURVEY.md §2.1); provided for library parity and for unbounded-scene
pipelines.  All interval sets are dense padded [n_rays, S(+1)] arrays.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import pdf as pdf_ops


def transform_stot(sampling_type: str, s_vals: jnp.ndarray,
                   t_min: jnp.ndarray, t_max: jnp.ndarray) -> jnp.ndarray:
    """Map normalized s in [0,1] to distances (prop_net.py `_transform_stot`)."""
    if sampling_type == "uniform":
        return s_vals * (t_max - t_min)[..., None] + t_min[..., None]
    if sampling_type == "lindisp":
        inv = (1.0 / jnp.maximum(t_min, 1e-10))[..., None] * (1 - s_vals) + \
              (1.0 / jnp.maximum(t_max, 1e-10))[..., None] * s_vals
        return 1.0 / jnp.maximum(inv, 1e-10)
    raise ValueError(sampling_type)


def _weights_from_sigmas(sigmas: jnp.ndarray, t_vals: jnp.ndarray
                         ) -> jnp.ndarray:
    """Dense per-ray rendering weights (volrend math, batched layout)."""
    dt = t_vals[..., 1:] - t_vals[..., :-1]
    sdt = sigmas * dt
    # shifted (exclusive) cumsum: `cumsum - sdt` would produce inf - inf = NaN
    # at the opaque-background sample whose sigma is set to infinity
    excl = jnp.concatenate(
        [jnp.zeros_like(sdt[..., :1]), jnp.cumsum(sdt[..., :-1], -1)], -1)
    trans = jnp.exp(-excl)
    return trans * (1.0 - jnp.exp(-sdt))


def propnet_sampling(key, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                     prop_sigma_fns: Sequence[Callable],
                     prop_samples: Sequence[int], num_samples: int,
                     near_plane: float, far_plane: float,
                     sampling_type: str = "lindisp",
                     stratified: bool = False,
                     opaque_bkgd: bool = True):
    """Hierarchical proposal sampling (prop_net.py `sampling`).

    Returns (t_starts [R, num_samples], t_ends [R, num_samples],
    aux dict with per-level (t_vals, weights) for the prop loss).
    """
    r = rays_o.shape[0]
    t_min = jnp.full((r,), near_plane)
    t_max = jnp.full((r,), far_plane)
    cdfs = None
    s_vals = jnp.broadcast_to(jnp.linspace(0.0, 1.0, prop_samples[0] + 1),
                              (r, prop_samples[0] + 1))
    aux = {"levels": []}
    for lvl, (fn, n) in enumerate(zip(prop_sigma_fns, prop_samples)):
        if lvl > 0 or stratified:
            key, sub = jax.random.split(key) if key is not None else (None, None)
        if lvl > 0:
            s_vals = pdf_ops.sample_from_weighted(
                prev_t, prev_w, n, stratified=stratified, key=sub)
            t_vals = s_vals  # already in t space from prev edges
        else:
            if stratified and key is not None:
                jitter = jax.random.uniform(
                    sub, (r, prop_samples[0] + 1)) / (prop_samples[0] + 1)
                s_vals = jnp.clip(s_vals + jitter, 0.0, 1.0)
            t_vals = transform_stot(sampling_type, s_vals, t_min, t_max)
        t_mid = (t_vals[..., 1:] + t_vals[..., :-1]) / 2.0
        sigmas = fn(t_vals[..., :-1], t_vals[..., 1:])
        if opaque_bkgd:
            sigmas = sigmas.at[..., -1].set(jnp.inf)
        weights = _weights_from_sigmas(sigmas, t_vals)
        aux["levels"].append((t_vals, weights))
        prev_t, prev_w = t_vals, weights

    key, sub = jax.random.split(key) if key is not None else (None, None)
    t_final = pdf_ops.sample_from_weighted(prev_t, prev_w, num_samples,
                                           stratified=stratified, key=sub)
    return t_final[..., :-1], t_final[..., 1:], aux


def prop_loss(aux, t_vals_rf: jnp.ndarray, weights_rf: jnp.ndarray
              ) -> jnp.ndarray:
    """Total proposal supervision loss against the radiance field's
    histogram (prop_net.py `update_every_n_steps` / `_pdf_loss`)."""
    t_q = jax.lax.stop_gradient(t_vals_rf)
    w_q = jax.lax.stop_gradient(weights_rf)
    loss = 0.0
    for t_k, w_k in aux["levels"]:
        loss = loss + jnp.mean(
            jnp.sum(pdf_ops.pdf_loss(t_q, w_q, t_k, w_k), axis=-1))
    return loss
