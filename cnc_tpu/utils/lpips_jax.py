"""LPIPS (VGG16 flavor) in pure JAX with loadable weights.

Reference parity target: the pip `lpips` package the reference drivers call
(train_CNC_nerf_synthetic.py:296-298) — VGG16 backbone, per-layer unit
channel normalization, squared differences, learned non-negative 1x1 linear
heads, spatial averaging, summed over the five tap layers
(relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).

This environment ships no pretrained weights (zero egress), so the weights
load from an npz produced by tools/export_lpips_weights.py (run it anywhere
torchvision + lpips checkpoints exist).  Search order:

  1. $CNC_LPIPS_WEIGHTS
  2. <repo>/data/lpips_vgg16.npz
  3. ~/.cache/cnc_tpu/lpips_vgg16.npz

Without weights `load_weights()` returns None and callers record "n/a"
(never NaN) for the metric.
"""

from __future__ import annotations

import functools
import os
import pathlib
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, tap_after_this_conv?)
_VGG_PLAN = [
    (64, False), (64, True),            # relu1_2
    (128, False), (128, True),          # relu2_2
    (256, False), (256, False), (256, True),    # relu3_3
    (512, False), (512, False), (512, True),    # relu4_3
    (512, False), (512, False), (512, True),    # relu5_3
]
# lpips scaling layer constants (lpips/lpips.py ScalingLayer)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def _search_paths():
    env = os.environ.get("CNC_LPIPS_WEIGHTS")
    if env:
        yield pathlib.Path(env)
    repo = pathlib.Path(__file__).resolve().parents[2]
    yield repo / "data" / "lpips_vgg16.npz"
    yield pathlib.Path.home() / ".cache" / "cnc_tpu" / "lpips_vgg16.npz"


@functools.lru_cache(maxsize=1)
def load_weights() -> Optional[Dict[str, np.ndarray]]:
    """Weights dict (conv{i}_w [kh,kw,in,out], conv{i}_b, lin{j}_w [C]) or
    None when no weight file is found."""
    for p in _search_paths():
        if p and p.exists():
            data = dict(np.load(str(p)))
            n_convs = len(_VGG_PLAN)
            n_taps = sum(1 for _, t in _VGG_PLAN if t)
            want = ({f"conv{i}_w" for i in range(n_convs)}
                    | {f"conv{i}_b" for i in range(n_convs)}
                    | {f"lin{j}_w" for j in range(n_taps)})
            if want.issubset(data.keys()):
                return data
    return None


def _lpips_impl(w_leaves, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x, y: [H, W, 3] in [0, 1].  Returns scalar LPIPS distance."""
    def features(img):
        h = (img * 2.0 - 1.0 - _SHIFT) / _SCALE       # lpips ScalingLayer
        h = h[None]                                   # NHWC
        taps = []
        for i, (_, tap) in enumerate(_VGG_PLAN):
            h = jax.lax.conv_general_dilated(
                h, w_leaves[f"conv{i}_w"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.DEFAULT)
            h = jax.nn.relu(h + w_leaves[f"conv{i}_b"])
            if tap:
                taps.append(h)
                if len(taps) < 5:
                    h = jax.lax.reduce_window(
                        h, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                        (1, 2, 2, 1), "VALID")
        return taps

    tx, ty = features(x), features(y)
    total = 0.0
    for j, (fx, fy) in enumerate(zip(tx, ty)):
        nx = fx / jnp.sqrt(jnp.sum(fx ** 2, -1, keepdims=True) + 1e-10)
        ny = fy / jnp.sqrt(jnp.sum(fy ** 2, -1, keepdims=True) + 1e-10)
        d2 = (nx - ny) ** 2                            # [1, H, W, C]
        lin = jnp.maximum(w_leaves[f"lin{j}_w"], 0.0)  # non-negative head
        total = total + jnp.mean(jnp.sum(d2 * lin, axis=-1))
    return total


_JITTED = {}


def lpips(img1: np.ndarray, img2: np.ndarray,
          weights: Optional[Dict[str, np.ndarray]] = None) -> Optional[float]:
    """LPIPS distance of two [H, W, 3] images in [0,1]; None without weights."""
    w = weights if weights is not None else load_weights()
    if w is None:
        return None
    fn = _JITTED.get("fn")
    if fn is None:
        fn = jax.jit(_lpips_impl)
        _JITTED["fn"] = fn
    leaves = {k: jnp.asarray(v) for k, v in w.items()}
    return float(fn(leaves, jnp.asarray(img1, jnp.float32),
                    jnp.asarray(img2, jnp.float32)))
