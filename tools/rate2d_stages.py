"""Stage-by-stage cost of rate_bits_2d at flagship scale (TPU).

VERDICT r4 next #4: the rate2d grad measures 1.18 s against a ~0.6 s
op-count floor (ROOFLINE.md §2) — the only step program >=2x off.  This
mirrors tools/rate3d_stages.py: the rate_bits_2d body is copied with
early-exit stages so each increment is timed, plus grad variants, so the
gap is attributed to a measured stage instead of a guess.

Stages (cumulative):
  1  pn frac planes, 3 axes (gather + per-feature cumsums)
  2  + global-Pg bits, all levels x axes
  3  + window slices + footprint-mask gathers (9 ctx windows)
  4  + coarser-level ctx grid_encode
  5  + pn-plane bilinear gather
  6  + per-level ctx2d linears
  7  + pooling + bernoulli bits  (== full rate_bits_2d forward)
  g7 grad of stage 7 wrt (tables, ent_params)   [cg0 semantics]
  g7n grad with use_dimension_wise=False        [frac cost incl. bwd]
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
    log(f"{name}: compile={tc:.1f}s run={(time.time()-t0)/iters*1e3:.0f}ms "
        f"(chk {s:.3e})")


def main():
    ctx_grad = "--cg1" in sys.argv
    if "--tiny" in sys.argv:      # CPU shake-out of the tool itself
        from cnc_tpu.config import GridSpec
        ecfg = EntropyConfig(n_features=2, sample_num=256,
                             max_context_layer_num=2, Pg_level=4,
                             Pg_level_2D=2, skip_levels_3d=(0, 1),
                             skip_levels_2d=(0,), Rb=16,
                             pn_coords_cap=1 << 14, pn_frac_sample_cap=None,
                             sample_num_2d=128, v_ctx_cap=1 << 11,
                             ctx_grad=ctx_grad)
        spec3 = GridSpec(num_dim=3, n_features=2,
                         resolutions=(10, 18, 34, 66), log2_hashmap_size=10)
        spec2 = GridSpec(num_dim=2, n_features=2, resolutions=(18, 34),
                         log2_hashmap_size=8)
        ctx = cm.ContextModels(ecfg, spec3, spec2)
    else:
        cfg = CNCConfig(
            model=ModelConfig(n_features_per_level=4),
            entropy=EntropyConfig(n_features=4, sample_num=100000,
                                  ctx_grad=ctx_grad),
        )
        ctx = cm.ContextModels(cfg.entropy, cfg.model.grid_3d,
                               cfg.model.grid_2d)
    log("tables built")
    key = jax.random.PRNGKey(0)
    ent_params = ctx.init_params(key)
    rb = ctx.rb
    binaries = jnp.zeros((rb,) * 3, bool).at[
        rb // 4:3 * rb // 4, rb // 4:3 * rb // 4, rb // 4:3 * rb // 4
    ].set(True)
    cache = ctx.refresh_cache(binaries)
    k2 = jax.random.split(key, 5)
    f = ctx.cfg.n_features
    tables = {
        "xyz": jnp.sign(jax.random.normal(
            k2[0], (ctx.spec3.total_entries, f)) + .2),
    }
    for i, ax in enumerate(("xy", "xz", "yz")):
        tables[ax] = jnp.sign(jax.random.normal(
            k2[i + 1], (ctx.spec2.total_entries, f)) + .2)
    tbls = ctx.table_arrays
    ecfg = ctx.cfg

    def stages(tables, ent_params, cache, tbls, stage, use_frac=True):
        acc = 0.0
        fine_table = tables["xyz"]
        fracs = {}
        if use_frac:
            for ax in ("xy", "xz", "yz"):
                fp = ctx.pn_frac_plane(fine_table, cache["pn"][ax],
                                       sample_cap=ecfg.pn_frac_sample_cap)
                if not ecfg.pn_frac_grad:
                    fp = jax.lax.stop_gradient(fp)
                fracs[ax] = fp
                acc = acc + jnp.sum(fp)
        if stage == 1:
            return acc
        pgs = {}
        for ai, ax in enumerate(("xy", "xz", "yz")):
            for l in range(ctx.spec2.n_levels):
                level_slice = jax.lax.dynamic_slice_in_dim(
                    tables[ax], ctx.spec2.offsets[l],
                    ctx.spec2.level_sizes[l])
                pg_n, bits_n, _ = ent_ops.global_pg_bits(level_slice)
                pgs[(ax, l)] = pg_n
                acc = acc + bits_n
        if stage == 2:
            return acc
        # ---- ctx windows: copy of pool_2d_level with early exits
        for ai, ax in enumerate(("xy", "xz", "yz")):
            tbl2 = tables[ax]
            mask2d = cache["mask2d"][ai]
            for l in ctx.ctx_levels_2d:
                t = ctx.tables2d[l]
                u = jax.random.uniform(jax.random.fold_in(key, 10 * ai + l))
                start_e = jnp.round(
                    (t.n_entries - t.sample_n) * u).astype(jnp.int32)
                n_e, w = t.sample_n, t.max_win_pts
                a = tbls["2d"]
                start_v = a["cum"][t.c_off + start_e]
                end_v = a["cum"][t.c_off + start_e + n_e]
                (coords, slots), valid = cm._window_slices(
                    a, ("coords", "vert_entry"), t.v_off, start_v, end_v,
                    w, t.n_points)
                slots = slots - start_e
                evals = jax.lax.dynamic_slice(
                    a["entry_values"], (t.e_off + start_e,), (n_e,))
                xi = (coords >> 16).astype(jnp.int32)
                yi = (coords & 0xFFFF).astype(jnp.int32)
                occ_block = mask2d[ctx.mask2d_offsets[l]
                                   + xi * t.resolution + yi] & valid
                if stage == 3:
                    acc = acc + jnp.sum(occ_block)
                    continue
                x = xi.astype(jnp.float32)
                y = yi.astype(jnp.float32)
                pts = jnp.stack([(x - 0.5), (y - 0.5)], -1) / \
                    (t.resolution - 2.0)
                cln = min(l, ecfg.max_context_layer_num)
                ctx_src = (tbl2 if ecfg.ctx_grad
                           else jax.lax.stop_gradient(tbl2))
                ctx_f = enc.grid_encode(pts, ctx_src, ctx.spec2, l - cln, l,
                                        occ_mask=mask2d,
                                        mask_offsets=ctx.mask2d_offsets)
                if stage == 4:
                    acc = acc + jnp.sum(ctx_f)
                    continue
                feats = [ctx_f]
                if use_frac:
                    ctx_pn = enc.grid_encode_given_table(
                        pts, fracs[ax], ctx.pn_res, occ_mask=mask2d,
                        mask_offset=ctx.pn_mask_offset)
                    feats.append(ctx_pn)
                else:
                    # keep the linear's input width; the zeros cost nothing,
                    # so the timing isolates the frac-plane compute
                    feats.append(jnp.zeros((w, ecfg.n_features)))
                if stage == 5:
                    acc = acc + sum(jnp.sum(x) for x in feats)
                    continue
                feats.append(jnp.broadcast_to(pgs[(ax, l)][None, None],
                                              (w, 1)))
                mean = ctx.apply_ctx2d(ent_params["ctx2d"], l,
                                       jnp.concatenate(feats, -1))
                if stage == 6:
                    acc = acc + jnp.sum(mean)
                    continue
                slots = jnp.clip(slots, 0, n_e - 1)
                cnt = cm._segment_tail_values(
                    occ_block.astype(jnp.float32), slots,
                    jnp.ones_like(occ_block), n_e)
                msum = cm._segment_tail_values(mean, slots, occ_block, n_e)
                pooled = msum / jnp.maximum(cnt, 1.0)[:, None]
                covered = cnt > 0
                values_q = tbl2[t.offset + evals]
                bits = ent_ops.bernoulli_bits(values_q, pooled)
                bits = jnp.sum(jnp.where(covered[:, None], bits, 0.0))
                acc = acc + bits * (t.n_entries / t.sample_n)
        return acc

    for st in (1, 2, 3, 4, 5, 6, 7):
        bench(f"stage{st}",
              lambda tb, e, c2, tl, st=st: stages(tb, e, c2, tl, st),
              tables, ent_params, cache, tbls)

    def full_loss(tb, e):
        return stages(tb, e, cache, tbls, 7)

    bench("grad7", jax.grad(full_loss, argnums=(0, 1)), tables, ent_params)

    def nofrac_loss(tb, e):
        return stages(tb, e, cache, tbls, 7, use_frac=False)

    bench("grad7_nofrac", jax.grad(nofrac_loss, argnums=(0, 1)),
          tables, ent_params)

    def ref_loss(tb, e):
        return ctx.rate_bits_2d(e, tb, key, cache, tbls)

    bench("rate_bits_2d grad (reference impl)",
          jax.grad(ref_loss, argnums=(0, 1)), tables, ent_params)

    # ---- footprint-mask fill per window: the fraction of each window's
    # rows that actually carry pooling weight — the upper bound on what the
    # v_ctx_cap_2d compaction can save (round-5 lever)
    import copy
    import dataclasses as dc

    @jax.jit
    def _fills(cache, tbls):
        out = []
        for ai in range(3):
            for l in ctx.ctx_levels_2d:
                t = ctx.tables2d[l]
                a = tbls["2d"]
                start_v = a["cum"][t.c_off]
                end_v = a["cum"][t.c_off + t.sample_n]
                (coords, _), valid = cm._window_slices(
                    a, ("coords", "vert_entry"), t.v_off, start_v, end_v,
                    t.max_win_pts, t.n_points)
                xi = (coords >> 16).astype(jnp.int32)
                yi = (coords & 0xFFFF).astype(jnp.int32)
                occ = cache["mask2d"][ai][
                    ctx.mask2d_offsets[l] + xi * t.resolution + yi] & valid
                out.append(jnp.sum(occ) / occ.shape[0])
        return jnp.stack(out)

    fills = _fills(cache, tbls)
    i = 0
    for ai, ax in enumerate(("xy", "xz", "yz")):
        for l in ctx.ctx_levels_2d:
            log(f"window fill {ax} L{l}: w={ctx.tables2d[l].max_win_pts} "
                f"masked={float(fills[i]):.3f}")
            i += 1

    for cap in (1 << 18, 1 << 19):
        c2 = copy.copy(ctx)
        c2.cfg = dc.replace(ctx.cfg, v_ctx_cap_2d=cap)

        def cap_loss(tb, e, c2=c2):
            return c2.rate_bits_2d(e, tb, key, cache, tbls)

        bench(f"rate_bits_2d grad (v_ctx_cap_2d=2^{cap.bit_length()-1})",
              jax.grad(cap_loss, argnums=(0, 1)), tables, ent_params)
    log("done")


if __name__ == "__main__":
    main()
