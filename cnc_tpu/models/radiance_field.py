"""The CNC radiance field: binarized 3D hash grid + three 2D tri-plane grids.

Functional JAX re-design of NGPRadianceField_mygrid_2D3D (reference
examples/radiance_fields/ngp.py:365-645):

  density branch: 3D grid (12 levels) (+) xy/xz/yz 2D grids (4 levels each)
  (+) 63-dim sine positional embedding -> Linear(159->160) -> ReLU ->
  Linear(160->1+geo_feat); density = trunc_exp(h0 - 1) * inside-aabb selector
  (ngp.py:373,529-532).

  color branch: SH degree-4 direction encoding (16) (+) geo_feat ->
  3-layer 160-wide MLP -> sigmoid (ngp.py:498-552).

All four hash tables pass through STE binarization (or the configured
quantizer) before encoding, exactly as GridEncoder.forward (ngp.py:244-252).
Parameters are a plain pytree; `replace_tables` mirrors
update_embedding_params (ngp.py:507-512) for the decode path.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import encoding as enc
from ..ops import sh as sh_ops
from ..ops import ste as ste_ops


def _linear_init(key, fan_in: int, fan_out: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for W and b (torch nn.Linear default)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def linear(p, x):
    return x @ p["w"] + p["b"]


def mlp_dims(cfg: ModelConfig) -> Tuple[int, int]:
    pe_dim = 3 + 3 * 2 * cfg.pe_num_freqs
    base_in = (cfg.grid_3d.output_dim + 3 * cfg.grid_2d.output_dim + pe_dim)
    head_in = cfg.sh_degree ** 2 + cfg.geo_feat_dim
    return base_in, head_in


def init_radiance_field(key, cfg: ModelConfig) -> Dict:
    g3, g2 = cfg.grid_3d, cfg.grid_2d
    keys = jax.random.split(key, 10)
    std = 1e-4  # GridEncoder.reset_parameters (ngp.py:221-223)
    base_in, head_in = mlp_dims(cfg)
    params = {
        "xyz": jax.random.uniform(keys[0], (g3.total_entries, g3.n_features),
                                  minval=-std, maxval=std),
        "xy": jax.random.uniform(keys[1], (g2.total_entries, g2.n_features),
                                 minval=-std, maxval=std),
        "xz": jax.random.uniform(keys[2], (g2.total_entries, g2.n_features),
                                 minval=-std, maxval=std),
        "yz": jax.random.uniform(keys[3], (g2.total_entries, g2.n_features),
                                 minval=-std, maxval=std),
        "mlp_base": {
            "l0": _linear_init(keys[4], base_in, cfg.n_neurons),
            "l1": _linear_init(keys[5], cfg.n_neurons, 1 + cfg.geo_feat_dim),
        },
        "mlp_head": {
            "l0": _linear_init(keys[6], head_in, cfg.n_neurons),
            "l1": _linear_init(keys[7], cfg.n_neurons, cfg.n_neurons),
            "l2": _linear_init(keys[8], cfg.n_neurons, 3),
        },
    }
    return params


def contract_to_unisphere(x: jnp.ndarray, aabb: jnp.ndarray,
                          eps: float = 1e-6) -> jnp.ndarray:
    """Mip-NeRF-360 scene contraction (reference ngp.py:337-361, ord=2).

    aabb-normalized points map to [-1,1]; points outside the unit ball are
    contracted to |x| in [1,2); output is rescaled to [0,1]^3 for the hash
    grids.  Unbounded 360 scenes (nerf_360_v2 loader) query through this."""
    lo, hi = aabb[:3], aabb[3:]
    x = (x - lo) / (hi - lo) * 2.0 - 1.0
    mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    mag = jnp.maximum(mag, eps)
    x = jnp.where(mag > 1.0, (2.0 - 1.0 / mag) * (x / mag), x)
    return x / 4.0 + 0.5


def quantized_tables(params: Dict, cfg: ModelConfig) -> Dict[str, jnp.ndarray]:
    """Apply the configured STE quantizer to all four hash tables."""
    mode = ("ste_binary" if cfg.ste_binary else
            "ste_multistep" if cfg.ste_multistep else
            "add_noise" if cfg.add_noise else "none")
    if mode == "add_noise":
        raise NotImplementedError("add_noise tables need a PRNG key; "
                                  "CNC drivers use ste_binary")
    return {k: ste_ops.quantize_embedding(params[k], mode, cfg.Q)
            for k in ("xyz", "xy", "xz", "yz")}


def encode_position(params: Dict, cfg: ModelConfig, x01: jnp.ndarray,
                    tables: Optional[Dict] = None) -> jnp.ndarray:
    """Grid + plane + sine features for normalized positions in [0,1]^3
    (compose_3D_2D_embed, ngp.py:620-645)."""
    t = tables if tables is not None else quantized_tables(params, cfg)
    g3, g2 = cfg.grid_3d, cfg.grid_2d
    out_xyz = enc.grid_encode(x01, t["xyz"], g3)
    out_xy = enc.grid_encode(x01[:, (0, 1)], t["xy"], g2)
    out_xz = enc.grid_encode(x01[:, (0, 2)], t["xz"], g2)
    out_yz = enc.grid_encode(x01[:, (1, 2)], t["yz"], g2)
    out_pe = sh_ops.sine_embed(x01, cfg.pe_num_freqs)
    return jnp.concatenate([out_xyz, out_xy, out_xz, out_yz, out_pe], axis=-1)


def query_density(params: Dict, cfg: ModelConfig, aabb: jnp.ndarray,
                  x_world: jnp.ndarray, return_feat: bool = False,
                  tables: Optional[Dict] = None):
    """Density (+ optional geo features) at world positions (ngp.py:514-536).

    With cfg.unbounded the aabb normalization is replaced by the unisphere
    contraction (ngp.py:515-518); the selector applies on the contracted
    coordinates either way, exactly like the reference."""
    if cfg.unbounded:
        x01 = contract_to_unisphere(x_world, aabb)
    else:
        lo, hi = aabb[:3], aabb[3:]
        x01 = (x_world - lo) / (hi - lo)
    selector = jnp.all((x01 > 0.0) & (x01 < 1.0), axis=-1)
    feats = encode_position(params, cfg, x01, tables)
    h = linear(params["mlp_base"]["l0"], feats)
    h = jax.nn.relu(h)
    h = linear(params["mlp_base"]["l1"], h)
    density = ste_ops.trunc_exp(h[..., 0] - 1.0) * selector
    if return_feat:
        return density, h[..., 1:]
    return density


def query_rgb(params: Dict, cfg: ModelConfig, dirs: jnp.ndarray,
              geo_feat: jnp.ndarray) -> jnp.ndarray:
    """View-dependent color head (ngp.py:538-552)."""
    if cfg.use_viewdirs:
        d01 = (dirs + 1.0) / 2.0
        sh = sh_ops.sh_encode(d01, cfg.sh_degree)
        h = jnp.concatenate([sh, geo_feat], axis=-1)
    else:
        h = geo_feat
    h = jax.nn.relu(linear(params["mlp_head"]["l0"], h))
    h = jax.nn.relu(linear(params["mlp_head"]["l1"], h))
    h = linear(params["mlp_head"]["l2"], h)
    return jax.nn.sigmoid(h)


def forward(params: Dict, cfg: ModelConfig, aabb: jnp.ndarray,
            positions: jnp.ndarray, directions: jnp.ndarray,
            tables: Optional[Dict] = None):
    """rgb, sigma at sample positions (ngp.py:554-566)."""
    density, geo = query_density(params, cfg, aabb, positions,
                                 return_feat=True, tables=tables)
    rgb = query_rgb(params, cfg, directions, geo)
    return rgb, density


def replace_tables(params: Dict, new_tables: Dict[str, jnp.ndarray]) -> Dict:
    """Swap in decoded hash tables (update_embedding_params, ngp.py:507-512)."""
    out = dict(params)
    for k in ("xyz", "xy", "xz", "yz"):
        out[k] = new_tables[k]
    return out


def split_mlp_params(params: Dict) -> Dict:
    """Non-embedding parameters (for the 13-bit MLP quantization path,
    driver train_CNC_nerf_synthetic.py:508-556)."""
    return {"mlp_base": params["mlp_base"], "mlp_head": params["mlp_head"]}
