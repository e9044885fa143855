"""Time TPU compilation of each rate-path construct in isolation.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/compile_bisect.py [names...]
Writes one line per construct: name, lower_s, compile_s.
A fresh throwaway compilation-cache dir guarantees true compile timings.
"""
import os
import sys
import tempfile
import time

os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(prefix="jaxcc_")

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from cnc_tpu.config import CNCConfig, EntropyConfig, ModelConfig
from cnc_tpu.models import context_models as cm
from cnc_tpu.ops import encoding as enc
from cnc_tpu.ops import scatter_ops


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_compile(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    log(f"{name}: lower={t1-t0:.1f}s compile={t2-t1:.1f}s")
    return compiled


def main():
    only = set(sys.argv[1:])
    cfg = CNCConfig(
        model=ModelConfig(n_features_per_level=4),
        entropy=EntropyConfig(n_features=4, sample_num=100000),
    )
    spec3 = cfg.model.grid_3d
    T = spec3.total_entries
    f = 4
    N = cfg.entropy.v_ctx_cap          # 2M context vertices
    K = cfg.entropy.max_context_layer_num * 8   # 24 gathers/pt
    log(f"T={T} N={N} K={K}")
    key = jax.random.PRNGKey(0)

    def want(n):
        return not only or n in only

    if want("ggi_fwd") or want("ggi_grad"):
        table = jnp.zeros((T, f), jnp.float32)
        gidx = jax.random.randint(key, (N, K), 0, T, jnp.int32)
        w = jnp.ones((N, K), jnp.float32) / K

        def fwd(table, gidx, w):
            return jnp.sum(scatter_ops.grouped_gather_interp(table, gidx, w, 3, f))

        if want("ggi_fwd"):
            timed_compile("ggi_fwd", fwd, table, gidx, w)
        if want("ggi_grad"):
            timed_compile("ggi_grad", jax.grad(fwd), table, gidx, w)

    if want("seg_tails_grad"):
        M = 1 << 23  # ~8M window vertices
        E = 200000

        def st(x):
            seg = jnp.minimum(jnp.arange(M, dtype=jnp.int32) // 41, E - 1)
            out = cm._segment_tail_values(x, seg, jnp.ones((M,), bool), E)
            return jnp.sum(out)

        timed_compile("seg_tails_grad", jax.grad(st), jnp.ones((M, f)))

    if want("encode_diff_grad"):
        table = jnp.zeros((T, f), jnp.float32)
        pts = jax.random.uniform(key, (N, 3))
        lv = jax.random.randint(key, (N,), 0, 9, jnp.int32)
        sat = jnp.zeros((129,) * 3, jnp.int32)

        def ed(table):
            out = enc.grid_encode_diff_levels(pts, table, spec3, lv, 3,
                                              occ_sat=sat)
            return jnp.sum(out)

        timed_compile("encode_diff_grad", jax.grad(ed), table)

    if want("compact_grad"):
        M = 1 << 23

        def comp(x):
            mask = x[:, 0] > 0.0
            c = jnp.cumsum(mask.astype(jnp.int32))
            src = jnp.searchsorted(c, jnp.arange(1, N + 1, dtype=jnp.int32))
            src = jnp.minimum(src, M - 1)
            cvalid = jnp.arange(N) < jnp.minimum(c[-1], N)
            vals = x[src]
            full = jnp.zeros((M, f))
            full = full.at[jnp.where(cvalid, src, M - 1)].set(
                jnp.where(cvalid[:, None], vals, 0.0), mode="drop",
                unique_indices=True)
            return jnp.sum(full)

        timed_compile("compact_grad", jax.grad(comp), jnp.ones((M, f)))

    if want("rate3d"):
        ent = cm.ContextModels(cfg.entropy, spec3, cfg.model.grid_2d)
        params = ent.init_params(key)
        cache = ent.init_cache()
        tbl3 = jnp.ones((T, f), jnp.float32)

        def loss(tbl3, params):
            return ent.rate_bits_3d(params, tbl3, key, cache)

        timed_compile("rate3d_grad", jax.grad(loss, argnums=(0, 1)),
                      tbl3, params)

    log("done")


if __name__ == "__main__":
    main()
