"""Per-jit runtime attribution for the bench-config training step (TPU)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import dataclasses
import jax

from cnc_tpu.utils.jit_cache import ensure_compilation_cache
ensure_compilation_cache()
import jax.numpy as jnp

from cnc_tpu.config import CNCConfig, EntropyConfig, ModelConfig, \
    RenderConfig, TrainConfig
from cnc_tpu.data import scenes
from cnc_tpu.train import driver
from cnc_tpu.train.trainer import Trainer


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    leaves = [l for l in jax.tree.leaves(x)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    return float(jnp.sum(leaves[0])) if leaves else None


def timed(name, fn, iters=3):
    r = fn()
    sync(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn()
        sync(r)
    log(f"{name}: {(time.time()-t0)/iters*1e3:.0f}ms")
    return r


def main():
    cfg = CNCConfig(
        model=ModelConfig(n_features_per_level=4),
        entropy=EntropyConfig(n_features=4, sample_num=100000),
        render=RenderConfig(),
        train=dataclasses.replace(TrainConfig(), lmbda=2e-3),
    )
    ds = scenes.ProceduralDataset("blocks", n_images=8, width=128, height=128,
                                  n_steps_gt=256)
    entropy = driver.build_entropy(cfg)
    log("tables built")
    tr = Trainer(cfg, ds, entropy=entropy)
    tr.fit(max_steps=2, log_every=0)       # compile everything (cache-warm)
    log("2 warm steps done")

    key = jax.random.PRNGKey(7)
    cache = tr._last_ent_cache
    bucket = 1 << 14
    rays, pixels = tr._fetch(bucket, key)
    bkgd = jnp.ones((3,))
    tbls = tr.entropy.table_arrays

    timed("fetch", lambda: tr._fetch(bucket, key))
    timed("render_grad", lambda: tr._render_grad_fn(bucket)(
        tr.params, tr.occ_state.binaries, rays.origins, rays.viewdirs,
        pixels, bkgd, key))
    scale = tr._rate_scale()
    timed("rate2d_grad", lambda: tr._rate2d_grad_fn()(
        tr.params, tr.ent_params, scale, key, cache, tbls))
    timed("rate3d_grad", lambda: tr._rate3d_grad_fn()(
        tr.params, tr.ent_params, scale, key, cache, tbls))
    g_rf, _ = tr._render_grad_fn(bucket)(
        tr.params, tr.occ_state.binaries, rays.origins, rays.viewdirs,
        pixels, bkgd, key)
    (g2, ge2), _ = tr._rate2d_grad_fn()(tr.params, tr.ent_params, scale,
                                        key, cache, tbls)
    timed("apply", lambda: tr._apply_fn(True)(
        tr.params, tr.ent_params, tr.opt_state_rf, tr.opt_state_ent,
        g_rf, g2, ge2))
    timed("occ_update", lambda: tr._occ_step(False)(
        tr.params, tr.occ_state, key))
    timed("cache_refresh", lambda: tr.entropy.refresh_cache(
        tr.occ_state.binaries), iters=2)
    log("done")


if __name__ == "__main__":
    main()
