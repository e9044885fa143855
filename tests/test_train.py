"""End-to-end training smoke test on a procedural scene (lambda=0 slice)."""

import pytest
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cnc_tpu.config import (CNCConfig, ModelConfig, RenderConfig, TrainConfig,
                            EntropyConfig)
from cnc_tpu.data import scenes
from cnc_tpu.train.trainer import Trainer
from cnc_tpu.train import optim
from cnc_tpu.utils import metrics as M


def tiny_config():
    return CNCConfig(
        model=ModelConfig(n_features_per_level=2, n_neurons=64,
                          resolutions_3d=(10, 18, 34, 66),
                          resolutions_2d=(18, 34),
                          log2_hashmap_size=12, log2_hashmap_size_2D=10,
                          pe_num_freqs=4),
        render=dataclasses.replace(
            RenderConfig(), render_step_size=0.02, occ_resolution=32,
            sample_budget=1 << 13, march_block=32),
        train=dataclasses.replace(
            TrainConfig(), init_batch_size=256, min_ray_bucket=256,
            max_ray_bucket=2048, target_sample_batch_size=1 << 13,
            lmbda=0.0, warmup_iters=20, lr_milestones=(60, 80),
            lr=6e-3),
    )


def test_schedule_matches_torch_chained():
    tcfg = dataclasses.replace(TrainConfig(), lr=1.0, warmup_iters=10,
                               warmup_start_factor=0.1, lr_milestones=(20, 30),
                               lr_gamma=0.5)
    s = optim.reference_schedule(tcfg)
    np.testing.assert_allclose(float(s(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(5)), 0.55, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(s(25)), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(s(35)), 0.25, rtol=1e-6)


@pytest.mark.slow
def test_training_improves_psnr():
    cfg = tiny_config()
    ds = scenes.ProceduralDataset("sphere", n_images=8, width=48, height=48,
                                  n_steps_gt=256)
    tr = Trainer(cfg, ds)
    tr.fit(max_steps=60, log_every=0)
    # render a training view and require decent reconstruction of the simple
    # scene after 60 steps
    rgb, gt = tr.eval_image(0)
    p = float(M.psnr(rgb, gt))
    assert np.isfinite(p)
    assert p > 14.0, f"psnr after training too low: {p}"


@pytest.mark.slow
def test_warm_compile_then_fit():
    """warm_compile populates the jit caches concurrently; fit() afterwards
    must reuse them (no behavior change) and train to finite metrics."""
    from cnc_tpu.train import driver

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        entropy=EntropyConfig(n_features=2, sample_num=512,
                              max_context_layer_num=2, Pg_level=3,
                              Pg_level_2D=2, skip_levels_3d=(0, 1),
                              skip_levels_2d=(0,), Rb=16,
                              pn_coords_cap=1 << 14, pn_frac_sample_cap=None,
                              sample_num_2d=256, v_ctx_cap=1 << 11),
        render=dataclasses.replace(cfg.render, occ_resolution=16),
        train=dataclasses.replace(cfg.train, lmbda=2e-3))
    ds = scenes.ProceduralDataset("sphere", n_images=4, width=32, height=32,
                                  n_steps_gt=64)
    entropy = driver.build_entropy(cfg)
    tr = Trainer(cfg, ds, entropy=entropy)
    tr.warm_compile(log_fn=None)
    assert tr.step == 0                      # no state advanced
    n_compiled = len(tr._jit_cache)
    tr.fit(max_steps=2, log_every=0)
    # the fit reused the warmed programs (only new-bucket fetch/render may add)
    assert len(tr._jit_cache) >= n_compiled
    rgb, gt = tr.eval_image(0)
    assert np.isfinite(float(M.psnr(rgb, gt)))


@pytest.mark.slow
def test_rate_update_interval():
    """rate_update_interval=2 must run rate grads only on even steps (ent
    params frozen in between) and keep training stable."""
    from cnc_tpu.train import driver

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        entropy=EntropyConfig(n_features=2, sample_num=512,
                              max_context_layer_num=2, Pg_level=3,
                              Pg_level_2D=2, skip_levels_3d=(0, 1),
                              skip_levels_2d=(0,), Rb=16,
                              pn_coords_cap=1 << 14, pn_frac_sample_cap=None,
                              sample_num_2d=256, v_ctx_cap=1 << 11),
        render=dataclasses.replace(cfg.render, occ_resolution=16),
        train=dataclasses.replace(cfg.train, lmbda=2e-3,
                                  rate_update_interval=2))
    ds = scenes.ProceduralDataset("sphere", n_images=4, width=32, height=32,
                                  n_steps_gt=64)
    entropy = driver.build_entropy(cfg)
    tr = Trainer(cfg, ds, entropy=entropy)
    snap = lambda: jax.tree.map(lambda x: np.asarray(x), tr.ent_params)
    e0 = snap()
    tr.fit(max_steps=0, log_every=0)            # step 0: rate runs
    e1 = snap()
    tr.fit(max_steps=1, log_every=0)            # step 1: rate skipped
    e2 = snap()
    changed01 = jax.tree_util.tree_reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool(np.any(a != b)), e0, e1))
    changed12 = jax.tree_util.tree_reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool(np.any(a != b)), e1, e2))
    assert changed01, "rate step 0 did not update entropy params"
    assert not changed12, "skipped step still updated entropy params"
    rgb, gt = tr.eval_image(0)
    assert np.isfinite(float(M.psnr(rgb, gt)))


def test_ssim_basics():
    a = jnp.ones((32, 32, 3)) * 0.5
    assert float(M.ssim(a, a)) > 0.99
    b = a + 0.3
    assert float(M.ssim(a, b)) < 0.9
