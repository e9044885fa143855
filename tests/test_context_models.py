"""Context-model tests: static tables, occupancy cache, rate estimate."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cnc_tpu.config import EntropyConfig, GridSpec
from cnc_tpu.models import context_models as cm
from cnc_tpu.ops import hash_ops, sat as sat_ops

import oracle


def tiny_setup():
    spec3 = GridSpec(num_dim=3, n_features=2, resolutions=(10, 18, 34, 66),
                     log2_hashmap_size=10)
    spec2 = GridSpec(num_dim=2, n_features=2, resolutions=(18, 34),
                     log2_hashmap_size=8)
    ecfg = EntropyConfig(
        n_features=2, sample_num=500, max_context_layer_num=2,
        Pg_level=4, Pg_level_2D=2, skip_levels_3d=(0, 1), skip_levels_2d=(0,),
        Rb=16, pn_coords_cap=1 << 17, pn_frac_sample_cap=None,
        sample_num_2d=None, v_ctx_cap=1 << 15)
    return ecfg, spec3, spec2


@pytest.fixture(scope="module")
def ctx():
    return cm.ContextModels(*tiny_setup())


@pytest.fixture(scope="module")
def binaries():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((16, 16, 16)) < 0.15)


@pytest.fixture(scope="module")
def cache(ctx, binaries):
    return ctx.refresh_cache(binaries)


class TestTables:
    def test_vertex_table_hash_parity(self, ctx):
        for l, t in ctx.tables3d.items():
            r = t.resolution
            assert t.n_vertices == r ** 3
            a = ctx.level_arrays_np("3d", l)
            pos = a["pos_flat"]
            xyz = np.stack([pos // (r * r), (pos // r) % r, pos % r], -1)
            idx = hash_ops.grid_index_np(xyz, r, ctx.spec3.level_sizes[l])
            np.testing.assert_array_equal(a["entry_values"][a["vert_entry"]],
                                          idx)
            counts = np.diff(a["cum"])
            assert counts.sum() == r ** 3
            assert np.all(counts > 0)
            assert a["cum"][0] == 0 and a["cum"][-1] == r ** 3

    def test_2d_lattice_block_structure(self, ctx):
        for l, t in ctx.tables2d.items():
            assert t.n_points == 16 * 16 * (t.tile + 2) ** 2
            a = ctx.level_arrays_np("2d", l)
            x = a["coords"] >> 16
            y = a["coords"] & 0xFFFF
            assert x.max() <= t.resolution - 1 and y.max() <= t.resolution - 1
            idx = hash_ops.grid_index_np(np.stack([x, y], -1), t.resolution,
                                         ctx.spec2.level_sizes[l])
            np.testing.assert_array_equal(a["entry_values"][a["vert_entry"]],
                                          idx)
            # cum is monotone and covers every lattice point
            assert a["cum"][0] == 0 and a["cum"][-1] == t.n_points
            assert np.all(np.diff(a["cum"]) > 0)

    def test_2d_entry_order_shuffled(self, ctx):
        """2D entry ORDER must not be raster order: sampled entry windows
        would be spatial slabs on dense levels (the reference shuffles its
        non-colliding levels for the same reason, utils_bpp_acc.py:311-315;
        VERDICT r2 #7)."""
        for l, t in ctx.tables2d.items():
            ev = ctx.level_arrays_np("2d", l)["entry_values"]
            # a shuffled order is far from sorted: fewer than 60% ascending
            # adjacent pairs (raster order would be 100%)
            frac_sorted = np.mean(np.diff(ev.astype(np.int64)) > 0)
            assert frac_sorted < 0.6, (l, frac_sorted)


class TestCache:
    def test_mask_grid_matches_pointwise_sat(self, ctx, binaries, cache):
        sat = sat_ops.build_sat(binaries)
        rng = np.random.default_rng(1)
        for l in range(ctx.spec3.n_levels):
            r = ctx.spec3.resolutions[l]
            pts = rng.integers(0, r, size=(200, 3))
            want = np.asarray(sat_ops.occupancy_mask(sat, jnp.asarray(pts), r,
                                                     16))
            flat = pts[:, 0] * r * r + pts[:, 1] * r + pts[:, 2]
            got = np.asarray(cache["mask3d"])[ctx.mask3d_offsets[l] + flat]
            np.testing.assert_array_equal(got, want)

    def test_mask2d_matches_pointwise_sat(self, ctx, binaries, cache):
        bin2d = np.asarray(cache["bin2d"])
        rng = np.random.default_rng(7)
        for ai in range(3):
            sat = sat_ops.build_sat(jnp.asarray(bin2d[ai]))
            for li, r in enumerate(ctx.mask2d_resolutions):
                pts = rng.integers(0, r, size=(200, 2))
                want = np.asarray(sat_ops.occupancy_mask(
                    sat, jnp.asarray(pts), r, 16))
                flat = pts[:, 0] * r + pts[:, 1]
                got = np.asarray(cache["mask2d"][ai])[
                    ctx.mask2d_offsets[li] + flat]
                np.testing.assert_array_equal(got, want)

    def test_2d_float_coverage_matches_codec(self, ctx, binaries, cache):
        """Training-time 2D rate coverage == coded coverage (VERDICT r3 weak
        #2): pool_2d_level (float, footprint mask) and pool_2d_level_int
        (codec) must mark the identical covered-entry set, or the trained
        rate bills a different subset than the bitstream codes."""
        from cnc_tpu.codec import intctx

        # dimension-wise prior off: the frac plane changes probabilities,
        # never coverage, and None keeps the context-MLP width consistent
        ecfg, spec3, spec2 = tiny_setup()
        ctx = cm.ContextModels(
            dataclasses.replace(ecfg, use_dimension_wise=False), spec3, spec2)
        cache = ctx.refresh_cache(binaries)
        key = jax.random.PRNGKey(3)
        ent_params = ctx.init_params(key)
        int_params = intctx.quantize_ctx_params(ent_params)
        f = ctx.cfg.n_features
        tbl2 = jnp.where(
            jax.random.normal(key, (ctx.spec2.total_entries, f)) > 0.0,
            1.0, -1.0)
        sign2 = intctx.sign_table(tbl2)
        cache_i = ctx.refresh_cache_int(binaries)
        for ai in range(3):
            for l in ctx.ctx_levels_2d:
                t = ctx.tables2d[l]
                _, cov_f, _ = ctx.pool_2d_level(
                    ent_params, tbl2, l, jnp.float32(0.5), None,
                    cache["bin2d"][ai], cache["mask2d"][ai], 0,
                    t.n_entries, t.n_points)
                _, _, cov_i, _ = ctx.pool_2d_level_int(
                    int_params, sign2, l,
                    jnp.int32(intctx.quantize_pg(0.5)), None,
                    cache_i["mask2d"][ai], 0, t.n_entries, t.n_points, 0)
                np.testing.assert_array_equal(np.asarray(cov_f),
                                              np.asarray(cov_i))

    def test_overlap_grid_matches_pointwise(self, ctx, binaries, cache):
        sat = sat_ops.build_sat(binaries)
        rng = np.random.default_rng(2)
        for l in ctx.ctx_levels_3d:
            r = ctx.tables3d[l].resolution
            pts = rng.integers(0, r, size=(100, 3))
            want = np.asarray(sat_ops.overlap_volume_cells(
                sat, jnp.asarray(pts), r, 16))
            flat = pts[:, 0] * r * r + pts[:, 1] * r + pts[:, 2]
            got = np.asarray(cache["ovl"][str(l)])[flat]
            np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

    def test_pn_coords_match_numpy_dilation(self, ctx, binaries, cache):
        b = np.asarray(binaries)
        scale = ctx.pn_res - 2
        t = scale // 16
        up = np.repeat(np.repeat(np.repeat(b, t, 0), t, 1), t, 2)
        pad = np.pad(up, 1)
        dil = np.zeros_like(up)
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    dil |= pad[dx:dx + scale, dy:dy + scale, dz:dz + scale]
        n_expected = int(dil.sum())
        assert int(cache["pn"]["xy"]["n"]) == n_expected
        # bounds consistent: bin counts match projection histogram
        coords = np.argwhere(dil) + 1
        bins = (coords[:, 0] - 1) * scale + (coords[:, 1] - 1)
        want_counts = np.bincount(bins, minlength=scale * scale)
        bounds = np.asarray(cache["pn"]["xy"]["bounds"])
        np.testing.assert_array_equal(np.diff(bounds), want_counts)


class TestPnFrac:
    def test_frac_plane_against_numpy(self, ctx, binaries, cache):
        rng = np.random.default_rng(3)
        table = jnp.asarray(
            np.sign(rng.standard_normal((ctx.spec3.total_entries, 2))))
        plane = np.asarray(ctx.pn_frac_plane(table, cache["pn"]["xy"]))
        scale = ctx.pn_res - 2
        # numpy oracle
        b = np.asarray(binaries)
        t = scale // 16
        up = np.repeat(np.repeat(np.repeat(b, t, 0), t, 1), t, 2)
        pad = np.pad(up, 1)
        dil = np.zeros_like(up)
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    dil |= pad[dx:dx + scale, dy:dy + scale, dz:dz + scale]
        coords = np.argwhere(dil) + 1
        idx = hash_ops.grid_index_np(coords, ctx.pn_res, ctx.fine_size)
        vals = np.asarray(table)[ctx.fine_offset + idx]  # [M, F]
        pos = np.zeros((scale, scale, 2))
        cnt = np.zeros((scale, scale, 1))
        for c, v in zip(coords, vals):
            pos[c[0] - 1, c[1] - 1] += (v > 0.9)
            cnt[c[0] - 1, c[1] - 1, 0] += 1
        frac = pos / (cnt + 1e-6)
        padded = np.pad(frac, ((1, 1), (1, 1), (0, 0)))
        want = padded.transpose(1, 0, 2).reshape(-1, 2)
        np.testing.assert_allclose(plane, want, atol=1e-5)

    def test_sampled_frac_close_to_full(self, ctx, binaries, cache):
        rng = np.random.default_rng(4)
        table = jnp.asarray(
            np.sign(rng.standard_normal((ctx.spec3.total_entries, 2))))
        full = np.asarray(ctx.pn_frac_plane(table, cache["pn"]["xy"]))
        half = np.asarray(ctx.pn_frac_plane(table, cache["pn"]["xy"],
                                            sample_cap=1 << 14))
        # noisy estimator by design: most of the support agrees
        assert ((full > 0) == (half > 0)).mean() > 0.75

    @pytest.mark.parametrize("sample_cap", [None, 1 << 14, 1 << 10])
    def test_sharded_build_matches_replicated(self, ctx, binaries, cache,
                                              sample_cap):
        """Device-sliced partial histograms + psum reproduce the replicated
        frac plane (VERDICT r3 weak #5): same rows, same bins, adds reordered
        only within f32 tolerance.  1<<10 < take exercises the sampled branch
        where devices split the stride-sampled rows."""
        from jax.sharding import Mesh, PartitionSpec as P

        rng = np.random.default_rng(5)
        table = jnp.asarray(
            np.sign(rng.standard_normal((ctx.spec3.total_entries, 2))))
        pn = cache["pn"]["xz"]
        want = np.asarray(ctx.pn_frac_plane(table, pn, sample_cap=sample_cap))

        mesh = Mesh(np.asarray(jax.devices()), ("d",))
        body = lambda t: ctx.pn_frac_plane(t, pn, sample_cap=sample_cap,
                                           axis_name="d")
        got = np.asarray(jax.shard_map(
            body, mesh=mesh, in_specs=(P(),), out_specs=P(),
            check_vma=False)(table))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestSegmentTailsNumpy:
    def test_against_numpy(self):
        rng = np.random.default_rng(5)
        seg = np.sort(rng.integers(0, 50, size=300)).astype(np.int32)
        x = rng.standard_normal((300, 2)).astype(np.float32)
        valid = rng.random(300) < 0.7
        got = np.asarray(cm._segment_tail_values(
            jnp.asarray(x), jnp.asarray(seg), jnp.asarray(valid), 50))
        want = np.zeros((50, 2), np.float32)
        for s in range(50):
            m = (seg == s) & valid
            want[s] = x[m].sum(0)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestRateEstimate:
    def test_runs_and_differentiable(self, ctx, binaries, cache):
        ecfg, spec3, spec2 = tiny_setup()
        key = jax.random.PRNGKey(0)
        ent_params = ctx.init_params(key)
        rng = np.random.default_rng(6)
        raw = {k: jnp.asarray(rng.standard_normal(
            (spec.total_entries, 2)).astype(np.float32)) * 0.01
            for k, spec in (("xyz", spec3), ("xy", spec2), ("xz", spec2),
                            ("yz", spec2))}

        from cnc_tpu.ops import ste as ste_ops

        def loss(ent_p, raw_tables):
            tables = {k: ste_ops.ste_binary(v) for k, v in raw_tables.items()}
            bpp, mb = ctx.rate_estimate(ent_p, tables, binaries, key, cache)
            return bpp, mb

        bpp, grads = jax.value_and_grad(
            lambda e, r: loss(e, r)[0], argnums=(0, 1))(ent_params, raw)
        assert np.isfinite(float(bpp))
        # untrained context models predict confidently-wrong probabilities, so
        # the initial rate exceeds 1 bit/param (like the reference at step 0)
        assert 0.3 < float(bpp) < 30.0, float(bpp)
        g_ent, g_tab = grads
        for leaf in jax.tree.leaves(g_ent):
            assert np.all(np.isfinite(np.asarray(leaf)))
        assert float(jnp.abs(g_tab["xyz"]).sum()) > 0
        assert float(jnp.abs(g_tab["xy"]).sum()) > 0

    def test_3d_compacted_pooling_matches_window_layout(self, ctx, binaries,
                                                        cache):
        """The r4 compacted pooling (segment sums over the [cap] compacted
        vertices) must bill bit-for-bit the same 3D rate as the r1-r3
        window-layout pooling it replaced (scatter mean back to the
        concatenated windows, sum over all window rows)."""
        from cnc_tpu.ops import encoding as enc
        from cnc_tpu.ops import entropy as ent_ops
        from cnc_tpu.ops import scatter_ops

        key = jax.random.PRNGKey(11)
        ent_params = ctx.init_params(key)
        rng = np.random.default_rng(13)
        tbl3 = jnp.asarray(
            np.sign(rng.standard_normal(
                (ctx.spec3.total_entries, 2)) + 0.2).astype(np.float32))
        pg_by_level = {l: jnp.float32(0.4 + 0.05 * l)
                       for l in range(ctx.spec3.n_levels)}
        tbls = ctx.table_arrays

        got, util = ctx._bits_3d_sampled(ent_params, tbl3, pg_by_level, cache,
                                         key, tbls)
        assert 0.0 < float(util) <= 1.0

        # ---- old window-layout replica (same key => same windows) ----
        cfg = ctx.cfg
        f = cfg.n_features
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
        cap = cfg.v_ctx_cap
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
        k = cfg.max_context_layer_num
        ctx_feat = enc.grid_encode_diff_levels(
            pts, tbl3, ctx.spec3, clev - k, k, occ_mask=cache["mask3d"],
            mask_offsets=ctx.mask3d_offsets)
        pg_arr = jnp.stack([pg_by_level[l]
                            for l in range(ctx.spec3.n_levels)])
        ctx_feat = jnp.concatenate([ctx_feat, pg_arr[clev][:, None]], -1)
        mean = ctx.apply_ctx3d(ent_params["ctx3d"], ctx_feat)
        mean_full = jnp.zeros((pos.shape[0], f))
        mean_full = mean_full.at[
            jnp.where(cvalid, src, pos.shape[0] - 1)].set(
            jnp.where(cvalid[:, None], mean, 0.0), mode="drop",
            unique_indices=True)
        w = jnp.where(kept, ovl_w, 0.0)
        wsum = cm._segment_tail_values(w, slot, valid, e_total)
        pooled = cm._segment_tail_values(mean_full * w[:, None], slot,
                                         valid, e_total)
        pooled = pooled / jnp.maximum(wsum, 1e-9)[:, None]
        exist = wsum > 0
        evals = jnp.concatenate([
            p["entry_values"] + ctx.tables3d[p["level"]].offset
            for p in parts])
        values_q = tbl3[evals]
        bits = ent_ops.bernoulli_bits(values_q, pooled)
        bits = jnp.sum(jnp.where(exist[:, None], bits, 0.0))
        want = bits / ctx.ttl_sample_valid_3d * ctx.ttl_entries_valid_3d

        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    def test_ctx_grad_flag(self, ctx, binaries, cache):
        """ctx_grad=False must not change the forward rate, must keep the
        direct (coded-entry) gradient path alive, and must remove the
        context-gather contribution (grads differ from ctx_grad=True)."""
        ecfg, spec3, spec2 = tiny_setup()
        ctx_ng = cm.ContextModels(dataclasses.replace(ecfg, ctx_grad=False),
                                  spec3, spec2)
        cache_ng = ctx_ng.refresh_cache(binaries)
        key = jax.random.PRNGKey(3)
        ent_params = ctx.init_params(key)
        rng = np.random.default_rng(9)
        raw = {k: jnp.asarray(rng.standard_normal(
            (spec.total_entries, 2)).astype(np.float32)) * 0.01
            for k, spec in (("xyz", spec3), ("xy", spec2), ("xz", spec2),
                            ("yz", spec2))}
        from cnc_tpu.ops import ste as ste_ops

        def loss(model, cch, raw_tables):
            tables = {k: ste_ops.ste_binary(v) for k, v in raw_tables.items()}
            bpp, _ = model.rate_estimate(ent_params, tables, binaries, key,
                                         cch)
            return bpp

        b1, g1 = jax.value_and_grad(lambda r: loss(ctx, cache, r))(raw)
        b2, g2 = jax.value_and_grad(lambda r: loss(ctx_ng, cache_ng, r))(raw)
        np.testing.assert_allclose(float(b1), float(b2), rtol=1e-5)
        assert float(jnp.abs(g2["xyz"]).sum()) > 0      # direct path alive
        assert float(jnp.abs(g2["xy"]).sum()) > 0
        diff = float(jnp.abs(g1["xyz"] - g2["xyz"]).sum())
        assert diff > 0, "ctx_grad=True and False gave identical grads"

    @staticmethod
    def _calibrated_params(ctx, key):
        """Context params that always output p=0.5 (1 bit for any symbol)."""
        ent = ctx.init_params(key)
        ent = jax.tree.map(jnp.zeros_like, ent)
        ent["ctx3d"]["l2"]["b"] = ent["ctx3d"]["l2"]["b"] + 0.5
        for k in ent["ctx2d"]:
            ent["ctx2d"][k]["b"] = ent["ctx2d"][k]["b"] + 0.5
        return ent

    def test_calibrated_random_costs_one_bit(self, ctx, binaries, cache):
        ecfg, spec3, spec2 = tiny_setup()
        key = jax.random.PRNGKey(0)
        ent = self._calibrated_params(ctx, key)
        rng = np.random.default_rng(9)
        tables = {k: jnp.asarray(np.sign(rng.standard_normal(
            (spec.total_entries, 2))).astype(np.float32))
            for k, spec in (("xyz", spec3), ("xy", spec2), ("xz", spec2),
                            ("yz", spec2))}
        bpp, _ = ctx.rate_estimate(ent, tables, binaries, key, cache)
        # p=0.5 context + Pg~=0.5 global levels -> ~1 bit/param
        assert 0.9 < float(bpp) < 1.1, float(bpp)

    def test_biased_tables_cost_less(self, ctx, binaries, cache):
        """All-(+1) tables cost ~0 on global-Pg levels and exactly 1 bit on
        context entries under calibrated p=0.5 -> well below 1 bit/param."""
        ecfg, spec3, spec2 = tiny_setup()
        key = jax.random.PRNGKey(0)
        ent = self._calibrated_params(ctx, key)
        tables = {k: jnp.ones((spec.total_entries, 2))
                  for k, spec in (("xyz", spec3), ("xy", spec2),
                                  ("xz", spec2), ("yz", spec2))}
        bpp, _ = ctx.rate_estimate(ent, tables, binaries, key, cache)
        assert float(bpp) < 0.6, float(bpp)


class TestSegmentTails:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(12)
        n, s, f = 10000, 200, 3
        seg = np.sort(rng.integers(0, s, n)).astype(np.int32)
        x = rng.standard_normal((n, f)).astype(np.float32)
        valid = rng.random(n) < 0.8
        got = np.asarray(cm._segment_tail_values(
            jnp.asarray(x), jnp.asarray(seg), jnp.asarray(valid), s))
        want = np.zeros((s, f), np.float32)
        np.add.at(want, seg[valid], x[valid])
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_1d_and_grad(self):
        rng = np.random.default_rng(3)
        n, s = 4096, 64
        seg = np.sort(rng.integers(0, s, n)).astype(np.int32)
        x = rng.standard_normal(n).astype(np.float32)
        valid = rng.random(n) < 0.5
        want = np.zeros((s,), np.float32)
        np.add.at(want, seg[valid], x[valid])
        fn = lambda x: cm._segment_tail_values(
            x, jnp.asarray(seg), jnp.asarray(valid), s)
        got = np.asarray(fn(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-4)
        # gradient of sum over segments routes 1.0 to valid rows only
        g = np.asarray(jax.grad(lambda x: jnp.sum(fn(x)))(jnp.asarray(x)))
        np.testing.assert_allclose(g, valid.astype(np.float32), atol=1e-6)


class TestCtx2DBudget:
    """v_ctx_cap_2d: the 2D twin of the 3D ctx-vertex budget (round 5).

    Only footprint-masked rows carry pooling weight, so compact-then-encode
    is EXACT while the budget holds every masked row; overflow drops rows
    from the pooling like the 3D path (never biasing covered entries with
    zero means)."""

    def _capped(self, ctx, cap):
        import copy
        c2 = copy.copy(ctx)
        c2.cfg = dataclasses.replace(ctx.cfg, v_ctx_cap_2d=cap)
        return c2

    def test_capped_bits_exact_when_budget_holds(self, ctx, binaries, cache):
        key = jax.random.PRNGKey(21)
        ent_params = ctx.init_params(key)
        rng = np.random.default_rng(23)
        tables = {k: jnp.asarray(np.sign(rng.standard_normal(
            (spec.total_entries, 2)) + 0.1).astype(np.float32))
            for k, spec in (("xyz", ctx.spec3), ("xy", ctx.spec2),
                            ("xz", ctx.spec2), ("yz", ctx.spec2))}
        full = float(ctx.rate_bits_2d(ent_params, tables, key, cache))
        # budget one BELOW the window size takes the compacted path but
        # still holds every masked row at 15% occupancy
        w_max = max(t.max_win_pts for t in ctx.tables2d.values())
        capped = float(self._capped(ctx, w_max - 1).rate_bits_2d(
            ent_params, tables, key, cache))
        assert np.isclose(full, capped, rtol=1e-5), (full, capped)

    def test_overflow_drops_rows_from_pooling(self, ctx, binaries, cache):
        key = jax.random.PRNGKey(25)
        ent_params = ctx.init_params(key)
        rng = np.random.default_rng(27)
        level = 1
        t = ctx.tables2d[level]
        tbl2 = jnp.asarray(np.sign(rng.standard_normal(
            (ctx.spec2.total_entries, 2)) + 0.1).astype(np.float32))
        tbl3 = jnp.asarray(np.sign(rng.standard_normal(
            (ctx.spec3.total_entries, 2)) + 0.1).astype(np.float32))
        frac = ctx.pn_frac_plane(tbl3, cache["pn"]["xy"])
        args = (ent_params, tbl2, level, jnp.float32(0.5), frac,
                cache["bin2d"][0], cache["mask2d"][0], jnp.int32(0),
                t.n_entries, t.n_points)
        _, cov_full, _ = ctx.pool_2d_level(*args)
        small = self._capped(ctx, 32)
        pooled_s, cov_small, _ = small.pool_2d_level(*args)
        n_full, n_small = int(cov_full.sum()), int(cov_small.sum())
        assert n_small < n_full          # overflow really dropped entries
        assert 0 < n_small <= 32
        # dropped entries are EXCLUDED (covered=False), never billed at a
        # zero-mean probability
        assert np.all(np.isfinite(np.asarray(pooled_s)))

    def test_capped_bits_gradient_matches_full(self, ctx, binaries, cache):
        """The compacted path must preserve the OBJECTIVE, not just its
        value: gradients wrt the plane tables and the context models agree
        with the full-window path when the budget holds."""
        key = jax.random.PRNGKey(29)
        ent_params = ctx.init_params(key)
        rng = np.random.default_rng(31)
        tables = {k: jnp.asarray(np.sign(rng.standard_normal(
            (spec.total_entries, 2)) + 0.1).astype(np.float32))
            for k, spec in (("xyz", ctx.spec3), ("xy", ctx.spec2),
                            ("xz", ctx.spec2), ("yz", ctx.spec2))}
        w_max = max(t.max_win_pts for t in ctx.tables2d.values())
        capped = self._capped(ctx, w_max - 1)

        def loss(c, tb, e):
            return c.rate_bits_2d(e, tb, key, cache)

        g_full = jax.grad(loss, argnums=(1, 2))(ctx, tables, ent_params)
        g_cap = jax.grad(loss, argnums=(1, 2))(capped, tables, ent_params)
        for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_cap)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
