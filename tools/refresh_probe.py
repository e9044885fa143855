"""Decompose refresh_cache cost (TPU)."""
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
from cnc_tpu.ops import sat as sat_ops


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(name, fn, *args, iters=3):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    tc = time.time() - t0
    r = c(*args)
    leaves = [l for l in jax.tree.leaves(r)]
    s = float(jnp.sum(leaves[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        r = c(*args)
        s = float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    log(f"{name}: compile={tc:.1f}s run={(time.time()-t0)/iters*1e3:.0f}ms")


def main():
    cfg = CNCConfig(
        model=ModelConfig(n_features_per_level=4),
        entropy=EntropyConfig(n_features=4, sample_num=100000),
    )
    ctx = cm.ContextModels(cfg.entropy, cfg.model.grid_3d, cfg.model.grid_2d)
    log("tables built")
    key = jax.random.PRNGKey(0)
    binaries = jnp.zeros((128,) * 3, bool).at[32:96, 32:96, 32:96].set(True)

    bench("full_refresh", ctx._refresh_impl, binaries)
    bench("sat3d", sat_ops.build_sat, binaries)
    for lvl in (6, 10, 11):
        r = ctx.tables3d[lvl].resolution if lvl in ctx.tables3d else None
        if r is None:
            continue
        bench(f"mask_ovl_l{lvl}(r={r})",
              lambda b, r=r: cm._dense_mask_overlap_grids(b, r, ctx.rb),
              binaries)
    bench("pn_coords", ctx._refresh_pn_coords, binaries)
    log("done")


if __name__ == "__main__":
    main()
