"""Straight-through estimators and clipped activations.

Semantics mirror the reference exactly:
  * STE_binary  — examples/radiance_fields/ngp.py:22-39: forward clamps to
    [-1,1] then maps >=0 -> +1, <0 -> -1; backward passes gradient only where
    the (unclamped) input lies in [-1, 1].
  * STE_multistep — ngp.py:41-47: round(x*Q)/Q with identity gradient.
  * trunc_exp — ngp.py:318-334: exp forward, backward g*exp(clamp(x, max=15)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def ste_binary(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)


def _ste_binary_fwd(x):
    return ste_binary(x), x


def _ste_binary_bwd(x, g):
    mask = (jnp.abs(x) <= 1.0).astype(g.dtype)
    return (g * mask,)


ste_binary.defvjp(_ste_binary_fwd, _ste_binary_bwd)


@jax.custom_vjp
def ste_multistep(x: jnp.ndarray, q: float) -> jnp.ndarray:
    return jnp.round(x * q) / q


def _ste_multistep_fwd(x, q):
    return ste_multistep(x, q), None


def _ste_multistep_bwd(_, g):
    return (g, None)


ste_multistep.defvjp(_ste_multistep_fwd, _ste_multistep_bwd)


@jax.custom_vjp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, max=15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def quantize_embedding(params: jnp.ndarray, mode: str, q: float = 10.0,
                       noise_key=None) -> jnp.ndarray:
    """Apply the configured table quantization (GridEncoder.forward, ngp.py:244-252)."""
    if mode == "ste_binary":
        return ste_binary(params)
    if mode == "ste_multistep":
        return ste_multistep(params, q)
    if mode == "add_noise":
        assert noise_key is not None
        return params + (jax.random.uniform(noise_key, params.shape,
                                            params.dtype) - 0.5) / q
    if mode == "none":
        return params
    raise ValueError(f"unknown quantize mode: {mode}")
