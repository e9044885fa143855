"""Trace/lower timing probe for the mixed-level encode (CPU, no TPU needed)."""
import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from cnc_tpu.config import CNCConfig, EntropyConfig, ModelConfig
from cnc_tpu.ops import encoding as enc
from cnc_tpu.ops import hash_ops, sat as sat_ops


def t_lower(name, fn, *args):
    t0 = time.time()
    jax.jit(fn).lower(*args)
    print(f"{name}: lower={time.time()-t0:.1f}s", flush=True)


cfg = CNCConfig(model=ModelConfig(n_features_per_level=4))
spec3 = cfg.model.grid_3d
T = spec3.total_entries
N = 1 << 21
key = jax.random.PRNGKey(0)
table = jnp.zeros((T, 4), jnp.float32)
pts = jax.random.uniform(key, (N, 3))
lv = jax.random.randint(key, (N,), 0, 9, jnp.int32)
sat = jnp.zeros((129,) * 3, jnp.int32)


def ed_full(table):
    return jnp.sum(enc.grid_encode_diff_levels(pts, table, spec3, lv, 3,
                                               occ_sat=sat))


def ed_nosat(table):
    return jnp.sum(enc.grid_encode_diff_levels(pts, table, spec3, lv, 3))


def static_full(table):
    return jnp.sum(enc.grid_encode(pts, table, spec3, 0, 12, occ_sat=sat))


t_lower("ed_fwd", ed_full, table)
t_lower("ed_grad", jax.grad(ed_full), table)
t_lower("ed_grad_nosat", jax.grad(ed_nosat), table)
t_lower("static_grad", jax.grad(static_full), table)
