"""Classic MLP radiance fields (vanilla NeRF, T-NeRF, NDR warp field).

Library-parity port of the reference's example fields (examples/
radiance_fields/mlp.py:14-395): 8x256 trunk with a skip connection at layer
4, viewdir-conditioned color head, optional time conditioning for D-NeRF,
and the NDR invertible-warp deformation field (mlp.py:286-395,
arXiv:2206.15258).  Unused by the CNC drivers; provided so nerfacc-style
pipelines have their model family available.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import sh as sh_ops
from ..ops import ste as ste_ops
from .radiance_field import _linear_init, linear


def init_vanilla_nerf(key, net_depth: int = 8, net_width: int = 256,
                      skip_layer: int = 4, pe_freqs: int = 10,
                      dir_freqs: int = 4, time_input: bool = False) -> Dict:
    pos_dim = 3 + 3 * 2 * pe_freqs + (1 + 2 * 4 if time_input else 0)
    dir_dim = 3 + 3 * 2 * dir_freqs
    keys = jax.random.split(key, net_depth + 4)
    trunk = []
    in_dim = pos_dim
    for i in range(net_depth):
        if i == skip_layer + 1:
            in_dim = net_width + pos_dim
        trunk.append(_linear_init(keys[i], in_dim, net_width))
        in_dim = net_width
    return {
        "trunk": trunk,
        "sigma": _linear_init(keys[net_depth], net_width, 1),
        "bottleneck": _linear_init(keys[net_depth + 1], net_width, net_width),
        "rgb0": _linear_init(keys[net_depth + 2], net_width + dir_dim,
                             net_width // 2),
        "rgb1": _linear_init(keys[net_depth + 3], net_width // 2, 3),
        "meta": {"skip_layer": skip_layer, "pe_freqs": pe_freqs,
                 "dir_freqs": dir_freqs, "time_input": time_input},
    }


def _trunk(params, x_enc):
    meta = params["meta"]
    h = x_enc
    for i, layer in enumerate(params["trunk"]):
        if i == meta["skip_layer"] + 1:
            h = jnp.concatenate([h, x_enc], -1)
        h = jax.nn.relu(linear(layer, h))
    return h


def query_density(params: Dict, x: jnp.ndarray,
                  t: Optional[jnp.ndarray] = None, return_feat: bool = False):
    meta = params["meta"]
    enc = sh_ops.sine_embed(x, meta["pe_freqs"])
    if meta["time_input"]:
        assert t is not None
        enc = jnp.concatenate([enc, sh_ops.sine_embed(t, 4)], -1)
    h = _trunk(params, enc)
    sigma = jax.nn.relu(linear(params["sigma"], h))[..., 0]
    if return_feat:
        return sigma, h
    return sigma


def forward(params: Dict, x: jnp.ndarray, dirs: jnp.ndarray,
            t: Optional[jnp.ndarray] = None):
    meta = params["meta"]
    sigma, h = query_density(params, x, t, return_feat=True)
    b = linear(params["bottleneck"], h)
    d_enc = sh_ops.sine_embed(dirs, meta["dir_freqs"])
    h2 = jax.nn.relu(linear(params["rgb0"], jnp.concatenate([b, d_enc], -1)))
    rgb = jax.nn.sigmoid(linear(params["rgb1"], h2))
    return rgb, sigma


# --------------------------------------------------------------- NDR field
# Invertible coordinate warp ahead of a static vanilla NeRF
# (NDRTNeRFRadianceField, mlp.py:286-395; arXiv:2206.15258): three
# real-NVP-style coupling blocks, each lifting (uv, w) -> (R(-theta)(uv-t),
# w+dw) with dw/theta/t predicted from positional+time encodings, a
# coordinate roll between blocks (the two rolls compose to the identity, so
# the warp is ~identity at init thanks to the U(0, 1e-4) output inits).

def _small_mlp_init(key, in_dim: int, widths, out_dim: int) -> Dict:
    """Hidden ReLU layers + a U(0, 1e-4)-initialized output layer (the
    reference's output_init=uniform_(b=1e-4), mlp.py:300-322): the warp
    starts numerically at the identity."""
    keys = jax.random.split(key, len(widths) + 1)
    hidden = []
    d = in_dim
    for k, wdt in zip(keys[:-1], widths):
        hidden.append(_linear_init(k, d, wdt))
        d = wdt
    w = jax.random.uniform(keys[-1], (d, out_dim), minval=0.0, maxval=1e-4)
    return {"hidden": hidden, "out": {"w": w, "b": jnp.zeros((out_dim,))}}


def _small_mlp(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    h = x
    for layer in p["hidden"]:
        h = jax.nn.relu(linear(layer, h))
    return linear(p["out"], h)


def init_ndr_nerf(key) -> Dict:
    """NDR deformation field over a vanilla NeRF (mlp.py:290-337)."""
    keys = jax.random.split(key, 13)
    blocks = []
    pe1 = 2 * (1 + 2 * 4)       # posi_encoder_1: 2-dim uv, 4 freqs, identity
    pe2 = 1 * (1 + 2 * 4)       # posi_encoder_2: 1-dim w
    te = 1 * (1 + 2 * 4)        # time encoder
    for i in range(3):
        blocks.append({
            "warp1": _small_mlp_init(keys[4 * i], pe1 + 64, (128, 128), 1),
            "warp2": _small_mlp_init(keys[4 * i + 1], pe2 + 64, (128,), 3),
            "time1": _linear_init(keys[4 * i + 2], te, 64),
            "time2": _linear_init(keys[4 * i + 3], te, 64),
        })
    return {"blocks": blocks, "nerf": init_vanilla_nerf(keys[12])}


def _ndr_block(block: Dict, x: jnp.ndarray, t_enc: jnp.ndarray):
    """One coupling block (mlp.py:339-357)."""
    uv, w = x[:, :2], x[:, 2:]
    dw = _small_mlp(block["warp1"], jnp.concatenate(
        [sh_ops.sine_embed(uv, 4), linear(block["time1"], t_enc)], -1))
    w = w + dw
    rt = _small_mlp(block["warp2"], jnp.concatenate(
        [sh_ops.sine_embed(w, 4), linear(block["time2"], t_enc)], -1))
    theta = rt[:, 0]
    tr = rt[:, 1:]
    c, s = jnp.cos(theta), jnp.sin(theta)
    d = uv - tr
    # R(-theta) @ (uv - t)  (euler2rot_2dinv, mlp.py:385-395)
    uv = jnp.stack([c * d[:, 0] + s * d[:, 1],
                    -s * d[:, 0] + c * d[:, 1]], -1)
    return jnp.concatenate([uv, w], -1)


def ndr_warp(params: Dict, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """x: [N,3]; t: [N,1] timestamps -> warped coordinates (mlp.py:359-366)."""
    t_enc = sh_ops.sine_embed(t, 4)
    x = _ndr_block(params["blocks"][0], x, t_enc)
    x = x[..., jnp.array([1, 2, 0])]
    x = _ndr_block(params["blocks"][1], x, t_enc)
    x = x[..., jnp.array([2, 0, 1])]
    x = _ndr_block(params["blocks"][2], x, t_enc)
    return x


def ndr_query_density(params: Dict, x: jnp.ndarray, t: jnp.ndarray):
    return query_density(params["nerf"], ndr_warp(params, x, t))


def ndr_forward(params: Dict, x: jnp.ndarray, dirs: jnp.ndarray,
                t: jnp.ndarray):
    return forward(params["nerf"], ndr_warp(params, x, t), dirs)


def ndr_query_opacity(params: Dict, key, x: jnp.ndarray,
                      timestamps: jnp.ndarray, step_size: float):
    """Random-timestamp opacity proxy (mlp.py:368-376)."""
    idx = jax.random.randint(key, (x.shape[0],), 0, timestamps.shape[0])
    t = timestamps[idx].reshape(-1, 1)
    return ndr_query_density(params, x, t) * step_size
