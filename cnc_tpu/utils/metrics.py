"""Image quality metrics: PSNR, SSIM (gaussian-window, pytorch_ssim-parity),
LPIPS (JAX VGG16 port, utils/lpips_jax.py).

LPIPS requires pretrained VGG weights (the reference uses the pip `lpips`
package, train_CNC_nerf_synthetic.py:296-298); this environment ships none
(zero egress), so `lpips_fn` returns None when no weight file is found
(see lpips_jax.load_weights search paths) and the drivers record "n/a".
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """-10 log10(mse) — driver formula (train_CNC_nerf_synthetic.py:372)."""
    return -10.0 * jnp.log(mse(a, b)) / math.log(10.0)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    g = jnp.exp(-((jnp.arange(size) - size // 2) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM with an 11x11 gaussian window (pytorch_ssim.py:8-120 parity).

    Args:
      img1, img2: [H, W, C] in [0, 1].
    """
    c = img1.shape[-1]
    win = _gaussian_window(window_size)
    kernel = jnp.broadcast_to(win[None, None], (c, 1, window_size, window_size))
    x = img1.transpose(2, 0, 1)[None]  # NCHW
    y = img2.transpose(2, 0, 1)[None]

    def conv(z):
        # HIGHEST precision: the variance terms are tiny differences of
        # large window sums, and default (bf16-class) conv precision breaks
        # them badly enough to push SSIM far above 1.
        return jax.lax.conv_general_dilated(
            z, kernel, window_strides=(1, 1),
            padding=[(window_size // 2,) * 2] * 2,
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST)

    mu1, mu2 = conv(x), conv(y)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1 = conv(x * x) - mu1_sq
    sigma2 = conv(y * y) - mu2_sq
    sigma12 = conv(x * y) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1 + sigma2 + c2))
    return jnp.mean(m)


def lpips_fn(img1: np.ndarray, img2: np.ndarray) -> Optional[float]:
    """VGG16 LPIPS (JAX port); None when no pretrained weights are found."""
    from . import lpips_jax
    return lpips_jax.lpips(img1, img2)
