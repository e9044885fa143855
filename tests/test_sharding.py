"""Multi-chip data-parallel training step on the virtual 8-device CPU mesh.

The reference is single-GPU only (SURVEY.md §2.7); this covers the TPU-native
extension in cnc_tpu/parallel/sharding.py — shard_map ray parallelism with
psum loss reduction and gradient transpose over replicated tables — plus the
driver validation hook contract (one full RD step must compile AND execute).
"""

import jax
import numpy as np
import pytest

from cnc_tpu.parallel import sharding

pytestmark = pytest.mark.slow


def test_dryrun_multichip_full_rd_step():
    assert len(jax.devices()) >= 8
    # executes one full data-parallel train step (render + entropy rate +
    # optimizer) and asserts finite outputs internally
    sharding.dryrun_multichip(8)


def test_shard_rays_roundtrip():
    mesh = sharding.make_mesh(8)
    x = np.arange(8 * 4 * 3, dtype=np.float32).reshape(8 * 4, 3)
    (xs,) = sharding.shard_rays(mesh, x)
    assert xs.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
        xs.ndim)
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_trainer_with_mesh_trains():
    """Trainer(mesh=...) shards rays + entropy windows across 8 devices and
    still reduces MSE on a tiny scene."""
    import dataclasses
    import jax.numpy as jnp
    from cnc_tpu.data import scenes
    from cnc_tpu.models import context_models as cm
    from cnc_tpu.train.trainer import Trainer
    from cnc_tpu.config import (CNCConfig, EntropyConfig, ModelConfig,
                                RenderConfig, TrainConfig)

    mesh = sharding.make_mesh(8)
    mcfg = ModelConfig(n_features_per_level=2, n_neurons=32,
                       resolutions_3d=(10, 18, 34, 66), resolutions_2d=(18, 34),
                       log2_hashmap_size=10, log2_hashmap_size_2D=8,
                       pe_num_freqs=4)
    ecfg = EntropyConfig(n_features=2, sample_num=64, max_context_layer_num=2,
                         Pg_level=4, Pg_level_2D=2, skip_levels_3d=(0, 1),
                         skip_levels_2d=(0,), Rb=16, pn_coords_cap=1 << 12,
                         pn_frac_sample_cap=None, sample_num_2d=64,
                         v_ctx_cap=1 << 9)
    cfg = CNCConfig(
        model=mcfg, entropy=ecfg,
        render=dataclasses.replace(RenderConfig(), occ_resolution=16,
                                   render_step_size=0.05,
                                   sample_budget=1 << 10, march_block=16),
        train=dataclasses.replace(TrainConfig(), lmbda=2e-3,
                                  init_batch_size=256, min_ray_bucket=256,
                                  max_ray_bucket=512,
                                  target_sample_batch_size=1 << 10,
                                  warmup_iters=5, lr_milestones=(50,)))
    ds = scenes.ProceduralDataset("sphere", n_images=2, width=24, height=24,
                                  n_steps_gt=32)
    entropy = cm.ContextModels(ecfg, mcfg.grid_3d, mcfg.grid_2d)
    tr = Trainer(cfg, ds, entropy=entropy, mesh=mesh)
    tr.fit(max_steps=12, log_every=0)
    rgb, gt = tr.eval_image(0)
    assert np.all(np.isfinite(np.asarray(rgb)))
