"""PDF resampling over per-ray interval sets.

TPU-shaped equivalents of nerfacc's ragged PDF ops (nerfacc/pdf.py:13-219 +
cuda/csrc/pdf.cu): intervals live in dense padded [n_rays, S+1] arrays
instead of packed ragged buffers, so binary search and inverse-CDF sampling
vectorize directly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def searchsorted(sorted_vals: jnp.ndarray, values: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row searchsorted (nerfacc pdf.py `searchsorted` semantics).

    Args:
      sorted_vals: [R, S] ascending per row.
      values: [R, Q].
    Returns:
      (ids_left, ids_right) like the reference: indices of the bracketing
      elements, clamped to the row.
    """
    right = jax.vmap(jnp.searchsorted)(sorted_vals, values)
    s = sorted_vals.shape[-1]
    ids_right = jnp.clip(right, 0, s - 1)
    ids_left = jnp.clip(right - 1, 0, s - 1)
    return ids_left, ids_right


def sample_from_weighted(t_vals: jnp.ndarray, weights: jnp.ndarray,
                         n_samples: int, stratified: bool = False,
                         key: Optional[jnp.ndarray] = None,
                         eps: float = 1e-5) -> jnp.ndarray:
    """Inverse-CDF sampling of new interval edges from per-bin weights.

    Args:
      t_vals: [R, S+1] interval edges (ascending).
      weights: [R, S] non-negative bin weights.
    Returns:
      [R, n_samples+1] new edges covering [t_vals[0], t_vals[-1]].
    """
    r, s = weights.shape
    pdf = weights + eps
    pdf = pdf / jnp.sum(pdf, -1, keepdims=True)
    cdf = jnp.concatenate([jnp.zeros((r, 1)), jnp.cumsum(pdf, -1)], -1)
    cdf = cdf / cdf[:, -1:]

    if stratified:
        assert key is not None
        u = (jnp.arange(n_samples + 1) +
             jax.random.uniform(key, (r, n_samples + 1))) / (n_samples + 1)
        u = jnp.sort(u, axis=-1)
    else:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_samples + 1),
                             (r, n_samples + 1))

    ids_left, ids_right = searchsorted(cdf, u)
    cdf_l = jnp.take_along_axis(cdf, ids_left, -1)
    cdf_r = jnp.take_along_axis(cdf, ids_right, -1)
    t_l = jnp.take_along_axis(t_vals, ids_left, -1)
    t_r = jnp.take_along_axis(t_vals, ids_right, -1)
    denom = jnp.where(cdf_r - cdf_l < 1e-10, 1.0, cdf_r - cdf_l)
    frac = jnp.clip((u - cdf_l) / denom, 0.0, 1.0)
    return t_l + frac * (t_r - t_l)


def outer_measure(t0: jnp.ndarray, w0: jnp.ndarray,
                  t1: jnp.ndarray) -> jnp.ndarray:
    """Outer measure of histogram (t0, w0) on bins t1 (PropNet `_outer`,
    nerfacc prop_net.py).

    Args:
      t0: [R, S0+1] source edges; w0: [R, S0] source weights.
      t1: [R, S1+1] query edges.
    Returns:
      [R, S1] upper-bound mass of each query bin.
    """
    r = t0.shape[0]
    cw0 = jnp.concatenate([jnp.zeros((r, 1)), jnp.cumsum(w0, -1)], -1)
    # indices of t1-lo/hi within t0
    idx_lo, _ = searchsorted(t0, t1[:, :-1])
    _, idx_hi = searchsorted(t0, t1[:, 1:])
    sum_lo = jnp.take_along_axis(cw0, idx_lo, -1)
    sum_hi = jnp.take_along_axis(cw0, idx_hi, -1)
    return jnp.clip(sum_hi - sum_lo, 0.0, None)


def pdf_loss(t_query: jnp.ndarray, w_query: jnp.ndarray,
             t_key: jnp.ndarray, w_key: jnp.ndarray,
             eps: float = 1e-7) -> jnp.ndarray:
    """Proposal supervision loss (PropNet `_pdf_loss`, mipnerf360 eq.(13)):
    penalize radiance-field mass the proposal's outer measure fails to cover.
    """
    w_outer = outer_measure(t_key, w_key, t_query)
    return jnp.clip(w_query - w_outer, 0.0, None) ** 2 / (w_query + eps)
