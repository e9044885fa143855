"""Decompose rate3d cost: fwd vs +bwd-of-fwd vs +table-scatters (TPU)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp

from cnc_tpu.config import CNCConfig, EntropyConfig, ModelConfig
from cnc_tpu.models import context_models as cm


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(name, fn, *args, iters=3):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    tc = time.time() - t0
    r = c(*args)
    s = float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.time()
    for _ in range(iters):
        r = c(*args)
        s = float(jnp.sum(jax.tree.leaves(r)[0]))
    log(f"{name}: compile={tc:.1f}s run={(time.time()-t0)/iters*1e3:.0f}ms")


def main():
    cfg = CNCConfig(
        model=ModelConfig(n_features_per_level=4),
        entropy=EntropyConfig(n_features=4, sample_num=100000),
    )
    ctx = cm.ContextModels(cfg.entropy, cfg.model.grid_3d, cfg.model.grid_2d)
    log("tables built; window total =",
        sum(ctx.tables3d[l].max_win_pts for l in ctx.ctx_levels_3d))
    key = jax.random.PRNGKey(0)
    ent_params = ctx.init_params(key)
    binaries = jnp.zeros((128,) * 3, bool).at[32:96, 32:96, 32:96].set(True)
    cache = ctx.refresh_cache(binaries)
    tbl3 = jnp.sign(jax.random.normal(key, (ctx.spec3.total_entries,
                                            cfg.entropy.n_features)) + 0.2)
    tbls = ctx.table_arrays

    def loss(tbl3, ent_params, cache, tbls):
        return ctx.rate_bits_3d(ent_params, tbl3, key, cache, tbls)

    bench("fwd_only", loss, tbl3, ent_params, cache, tbls)
    bench("grad_ent_only", jax.grad(loss, argnums=1), tbl3, ent_params,
          cache, tbls)
    bench("grad_full", jax.grad(loss, argnums=(0, 1)), tbl3, ent_params,
          cache, tbls)

    # context half only (excludes the 12 global-Pg level scans)
    pgs = {l: jnp.float32(0.5) for l in range(ctx.spec3.n_levels)}

    def ctx_only(tbl3, ent_params, cache, tbls):
        return ctx._bits_3d_sampled(ent_params, tbl3, pgs, cache, key,
                                    tbls)[0]

    bench("ctx_fwd", ctx_only, tbl3, ent_params, cache, tbls)
    bench("ctx_grad", jax.grad(ctx_only, argnums=(0, 1)), tbl3, ent_params,
          cache, tbls)
    log("done")


if __name__ == "__main__":
    main()
