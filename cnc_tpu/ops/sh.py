"""Closed-form real spherical harmonics direction encoding.

TPU-native replacement for the tiny-cuda-nn "SphericalHarmonics" encoding the
reference uses for view directions (ngp.py:412-425, degree 4 -> 16 dims).
Inputs follow the same convention: directions are mapped to [0,1] by the
caller ((d+1)/2, ngp.py:540) and this encoding maps them back to [-1,1]
internally, exactly like tcnn.
"""

from __future__ import annotations

import jax.numpy as jnp


def sh_encode(dirs01: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Evaluate the real SH basis (tcnn coefficient convention).

    Args:
      dirs01: [..., 3] directions scaled into [0, 1].
      degree: 1..4; output dim = degree**2.
    Returns:
      [..., degree**2] basis values.
    """
    assert 1 <= degree <= 4
    d = dirs01 * 2.0 - 1.0
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    x2, y2, z2 = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z

    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(out, axis=-1)


def sine_embed(x: jnp.ndarray, num_freqs: int = 10,
               include_input: bool = True) -> jnp.ndarray:
    """NeRF positional encoding (reference Embedder, ngp.py:569-617).

    Log-sampled frequency bands 2**0 .. 2**(num_freqs-1); per frequency the
    reference appends sin then cos, with the raw input first.
    Output dim for 3-D input and 10 freqs: 3 + 3*2*10 = 63.
    """
    outs = [x] if include_input else []
    for i in range(num_freqs):
        f = float(2 ** i)
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)
