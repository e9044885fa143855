"""Classic MLP radiance fields (vanilla NeRF, time-conditioned T-NeRF).

Library-parity port of the reference's example fields (examples/
radiance_fields/mlp.py:14-395): 8x256 trunk with a skip connection at layer
4, viewdir-conditioned color head, optional time conditioning for D-NeRF.
Unused by the CNC drivers; provided so nerfacc-style pipelines have their
model family available.
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
