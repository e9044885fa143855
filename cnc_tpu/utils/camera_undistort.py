"""OpenCV-model lens undistortion (iterative Newton).

Port of nerfacc's camera utilities (nerfacc/cameras.py:13-211 +
cuda/csrc/camera.cu / include/utils_camera.cuh:13-201): invert the radial
(k1..k4) + tangential (p1, p2) distortion by Newton iteration on the
residual, vectorized over pixels.  Unused by the CNC drivers (SURVEY.md
§2.1) but part of the library surface.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _residual_and_jacobian(x, y, xd, yd, params):
    """Distortion residual + jacobian (utils_camera.cuh semantics)."""
    k1, k2, k3, k4, p1, p2 = params
    r2 = x * x + y * y
    d = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
    d_r = k1 + r2 * (2.0 * k2 + r2 * (3.0 * k3 + r2 * 4.0 * k4))
    d_x = 2.0 * x * d_r
    d_y = 2.0 * y * d_r

    fx = d * x + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x) - xd
    fy = d * y + 2.0 * p2 * x * y + p1 * (r2 + 2.0 * y * y) - yd

    fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
    fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
    fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
    fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y
    return fx, fy, fx_x, fx_y, fy_x, fy_y


def radial_and_tangential_undistort(xd: jnp.ndarray, yd: jnp.ndarray,
                                    params, eps: float = 1e-9,
                                    max_iterations: int = 10
                                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Invert distortion: distorted normalized coords -> undistorted."""
    x, y = xd, yd
    for _ in range(max_iterations):
        fx, fy, fx_x, fx_y, fy_x, fy_y = _residual_and_jacobian(
            x, y, xd, yd, params)
        det = fx_y * fy_x - fx_x * fy_y
        safe = jnp.abs(det) > eps
        det = jnp.where(safe, det, 1.0)
        dx = (fx * fy_y - fy * fx_y) / det
        dy = (fy * fx_x - fx * fy_x) / det
        x = jnp.where(safe, x + dx, x)
        y = jnp.where(safe, y + dy, y)
    return x, y


def opencv_lens_undistortion(uv: jnp.ndarray, params: jnp.ndarray,
                             max_iterations: int = 10) -> jnp.ndarray:
    """uv: [..., 2] distorted normalized coords; params: [6] or [4]
    (k1,k2[,k3,k4],p1,p2 layout per nerfacc cameras.py)."""
    p = jnp.zeros((6,)).at[:params.shape[-1]].set(params)
    if params.shape[-1] == 4:
        # (k1, k2, p1, p2) layout
        p = jnp.asarray([params[0], params[1], 0.0, 0.0, params[2], params[3]])
    x, y = radial_and_tangential_undistort(uv[..., 0], uv[..., 1],
                                           tuple(p[i] for i in range(6)),
                                           max_iterations=max_iterations)
    return jnp.stack([x, y], -1)
