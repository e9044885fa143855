"""Checkpoint roundtrip, profiling helpers, camera undistortion, PDF ops."""

import pytest
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from cnc_tpu.config import CNCConfig, ModelConfig, RenderConfig, TrainConfig
from cnc_tpu.data import scenes
from cnc_tpu.train.trainer import Trainer
from cnc_tpu.utils import checkpoint as ckpt
from cnc_tpu.utils import camera_undistort as cu
from cnc_tpu.ops import pdf as pdf_ops
from cnc_tpu.grids import prop_net


def tiny_cfg():
    return CNCConfig(
        model=ModelConfig(n_features_per_level=2, n_neurons=32,
                          resolutions_3d=(10, 18), resolutions_2d=(18,),
                          log2_hashmap_size=9, log2_hashmap_size_2D=8,
                          pe_num_freqs=2),
        render=dataclasses.replace(RenderConfig(), occ_resolution=16,
                                   render_step_size=0.05,
                                   sample_budget=1 << 10),
        train=dataclasses.replace(TrainConfig(), lmbda=0.0,
                                  init_batch_size=64, min_ray_bucket=64,
                                  max_ray_bucket=256,
                                  target_sample_batch_size=1 << 10))


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    ds = scenes.ProceduralDataset("sphere", n_images=2, width=24, height=24,
                                  n_steps_gt=64)
    tr = Trainer(cfg, ds)
    tr.fit(max_steps=3, log_every=0)
    path = str(tmp_path / "ck.npz")
    ckpt.save_checkpoint(path, tr)

    tr2 = Trainer(cfg, ds)
    ckpt.load_checkpoint(path, tr2)
    assert tr2.step == tr.step
    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(tr.occ_state.binaries),
                                  np.asarray(tr2.occ_state.binaries))
    # resumed training continues without error
    tr2.fit(max_steps=2, log_every=0)


def test_undistort_inverts_distortion():
    params = (0.05, -0.01, 0.0, 0.0, 0.001, -0.002)  # k1..k4, p1, p2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, 100).astype(np.float32))
    y = jnp.asarray(rng.uniform(-0.5, 0.5, 100).astype(np.float32))
    # distort forward
    k1, k2, k3, k4, p1, p2 = params
    r2 = x * x + y * y
    d = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
    xd = d * x + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = d * y + 2 * p2 * x * y + p1 * (r2 + 2 * y * y)
    xu, yu = cu.radial_and_tangential_undistort(xd, yd, params)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(y), atol=1e-5)


def test_pdf_sampling_concentrates_mass():
    r, s = 4, 32
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, s + 1), (r, s + 1))
    w = jnp.zeros((r, s)).at[:, 10:12].set(1.0)
    edges = pdf_ops.sample_from_weighted(t, w, 16)
    mid = np.asarray((edges[:, 1:] + edges[:, :-1]) / 2)
    frac_in = ((mid > 10 / 32) & (mid < 12 / 32)).mean()
    assert frac_in > 0.8


def test_outer_measure_conserves_total():
    rng = np.random.default_rng(1)
    t0 = jnp.asarray(np.sort(rng.uniform(0, 1, (2, 9)), -1).astype(np.float32))
    w0 = jnp.asarray(rng.random((2, 8)).astype(np.float32))
    t1 = jnp.broadcast_to(jnp.linspace(-0.1, 1.1, 5), (2, 5))
    outer = pdf_ops.outer_measure(t0, w0, t1)
    # covering bins upper-bound the whole mass
    assert np.all(np.asarray(outer.sum(-1)) >= np.asarray(w0.sum(-1)) - 1e-4)


def test_propnet_sampling_runs():
    key = jax.random.PRNGKey(0)
    r = 16
    rays_o = jnp.zeros((r, 3))

    def prop_fn(t0, t1):
        mid = (t0 + t1) / 2
        return jnp.exp(-((mid - 2.0) ** 2) * 4.0) * 5.0

    t0, t1, aux = prop_net.propnet_sampling(
        key, rays_o, rays_o, [prop_fn], [16], 8, 0.1, 5.0,
        sampling_type="uniform", stratified=False)
    assert t0.shape == (r, 8)
    assert np.all(np.asarray(t1) >= np.asarray(t0) - 1e-6)
    # samples concentrate near the density peak at t=2
    mid = np.asarray((t0 + t1) / 2)
    assert ((mid > 1.0) & (mid < 3.0)).mean() > 0.5
    w_rf = jnp.ones((r, 8)) / 8
    loss = prop_net.prop_loss(aux, jnp.concatenate([t0, t1[:, -1:]], -1), w_rf)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_trainer_periodic_checkpoint_and_resume(tmp_path):
    import os
    """fit() writes checkpoints at the configured cadence and a new Trainer
    resumes from them mid-run (reference has no checkpointing at all)."""
    import dataclasses
    from cnc_tpu.data import scenes
    from cnc_tpu.train.trainer import Trainer
    from test_train import tiny_config

    cp = str(tmp_path / "ck.npz")
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, checkpoint_path=cp,
                                       checkpoint_every=5))
    ds = scenes.ProceduralDataset("sphere", n_images=2, width=24, height=24,
                                  n_steps_gt=32)
    tr = Trainer(cfg, ds)
    tr.fit(max_steps=6, log_every=0)
    assert os.path.exists(cp)

    tr2 = Trainer(cfg, ds)   # auto-resumes in __init__
    assert tr2.step == 5
    np.testing.assert_allclose(np.asarray(tr2.params["xyz"]),
                               np.asarray(tr.params["xyz"]), atol=0.02)


def test_reset_state_then_load_checkpoint_resumes_in_place(tmp_path):
    """The RD sweep's per-point resume: after a watchdog restart the SAME
    trainer (compiled programs kept) is reset_state-ed for the point, its
    cfg re-pointed at the point's checkpoint, and the checkpoint loaded in
    place (tools/rd_sweep_depth.py).  Must reproduce the saved step/params
    and keep training."""
    cfg = tiny_cfg()
    ds = scenes.ProceduralDataset("sphere", n_images=2, width=24, height=24,
                                  n_steps_gt=64)
    tr = Trainer(cfg, ds)
    tr.fit(max_steps=4, log_every=0)
    cp = str(tmp_path / "ck_point.npz")
    ckpt.save_checkpoint(cp, tr)
    step_saved = tr.step   # fit runs steps 0..max_steps inclusive
    saved = np.asarray(jax.tree.leaves(tr.params)[0])

    # a fresh process would rebuild the trainer; here the same one restarts
    # the point: reset wipes state, the cfg swap re-arms periodic saves, the
    # load restores the point mid-flight
    tr.reset_state(lmbda=0.001, rate_update_interval=2)
    assert tr.step == 0
    tr.cfg = dataclasses.replace(
        tr.cfg, train=dataclasses.replace(tr.cfg.train, checkpoint_path=cp,
                                          checkpoint_every=500))
    assert int(np.load(cp)["step"]) == step_saved  # the sweep's step peek
    ckpt.load_checkpoint(cp, tr)
    assert tr.step == step_saved
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(tr.params)[0]),
                                  saved)
    tr.fit(max_steps=7, log_every=0)
    assert tr.step == 8
