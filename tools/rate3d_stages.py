"""Stage-by-stage forward cost of _bits_3d_sampled (TPU).

Copies the body with early-exit stages so each increment is timed.
"""
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
from cnc_tpu.ops import encoding as enc
from cnc_tpu.ops import entropy as ent_ops
from cnc_tpu.ops import scatter_ops


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(name, fn, *args, iters=3):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    tc = time.time() - t0
    r = c(*args)
    s = float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
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
    ent_params = ctx.init_params(key)
    binaries = jnp.zeros((128,) * 3, bool).at[32:96, 32:96, 32:96].set(True)
    cache = ctx.refresh_cache(binaries)
    tbl3 = jnp.sign(jax.random.normal(key, (ctx.spec3.total_entries, 4)) + .2)
    tbls = ctx.table_arrays
    ecfg = ctx.cfg

    def stages(tbl3, ent_params, cache, tbls, stage):
        f = ecfg.n_features
        parts = ctx._slice_3d_windows(jax.random.fold_in(key, 7), tbls)
        pos = jnp.concatenate([p["pos"] for p in parts])
        valid = jnp.concatenate([p["valid"] for p in parts])
        levels = jnp.concatenate([
            jnp.full((p["pos"].shape[0],), p["level"], jnp.int32)
            for p in parts])
        base = 0
        slots = []
        for p in parts:
            slots.append(p["slot"] + base)
            base += ctx.tables3d[p["level"]].sample_n
        slot = jnp.concatenate(slots)
        e_total = base
        mask = jnp.zeros_like(valid)
        ovl = jnp.zeros(pos.shape, jnp.float32)
        off = 0
        for p in parts:
            l = p["level"]
            n = p["pos"].shape[0]
            seg = slice(off, off + n)
            m_l = cache["mask3d"][ctx.mask3d_offsets[l] + pos[seg]]
            mask = mask.at[seg].set(m_l & valid[seg])
            ovl = ovl.at[seg].set(cache["ovl"][str(l)][pos[seg]])
            off += n
        ovl_w = jnp.maximum(jnp.floor(ovl * 1000.0), 1.0)
        if stage == 1:
            return jnp.sum(mask) + jnp.sum(ovl_w)
        cap = ecfg.v_ctx_cap
        c = jnp.cumsum(mask.astype(jnp.int32))
        total = c[-1]
        kept = mask & (c <= cap)
        src, _ = scatter_ops.compact_mask_indices(mask, cap)
        cvalid = jnp.arange(cap) < jnp.minimum(total, cap)
        clev = levels[src]
        cpos = pos[src]
        res_arr = jnp.asarray(ctx.spec3.resolutions, jnp.int32)[clev]
        xx = cpos // (res_arr * res_arr)
        yy = (cpos // res_arr) % res_arr
        zz = cpos % res_arr
        pts = (jnp.stack([xx, yy, zz], -1).astype(jnp.float32) - 0.5) / \
            (res_arr.astype(jnp.float32) - 2.0)[:, None]
        if stage == 2:
            return jnp.sum(pts)
        k = ecfg.max_context_layer_num
        ctx_feat = enc.grid_encode_diff_levels(
            pts, tbl3, ctx.spec3, clev - k, k,
            occ_mask=cache["mask3d"], mask_offsets=ctx.mask3d_offsets)
        if stage == 3:
            return jnp.sum(ctx_feat)
        pg_arr = jnp.full((ctx.spec3.n_levels,), 0.5)
        ctx_feat = jnp.concatenate([ctx_feat, pg_arr[clev][:, None]], -1)
        mean = ctx.apply_ctx3d(ent_params["ctx3d"], ctx_feat)
        if stage == 4:
            return jnp.sum(mean)
        mean_full = jnp.zeros((pos.shape[0], f))
        mean_full = mean_full.at[jnp.where(cvalid, src, pos.shape[0] - 1)].set(
            jnp.where(cvalid[:, None], mean, 0.0), mode="drop",
            unique_indices=True)
        w = jnp.where(kept, ovl_w, 0.0)
        wsum = cm._segment_tail_values(w, slot, valid, e_total)
        pooled = cm._segment_tail_values(mean_full * w[:, None], slot, valid,
                                         e_total)
        pooled = pooled / jnp.maximum(wsum, 1e-9)[:, None]
        exist = wsum > 0
        evals = jnp.concatenate([
            p["entry_values"] + ctx.tables3d[p["level"]].offset
            for p in parts])
        values_q = tbl3[evals]
        bits = ent_ops.bernoulli_bits(values_q, pooled)
        return jnp.sum(jnp.where(exist[:, None], bits, 0.0))

    for st in (1, 2, 3, 4, 5):
        bench(f"stage{st}",
              lambda t, e, c2, tb, st=st: stages(t, e, c2, tb, st),
              tbl3, ent_params, cache, tbls)
    log("done")


if __name__ == "__main__":
    main()
