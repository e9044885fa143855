"""Full-pipeline integration test: the reference's own acceptance loop
(train -> eval -> encode -> zero tables -> decode -> re-eval -> quantize,
train_CNC_nerf_synthetic.py:302-613) at tiny scale on a procedural scene.

Catches integration breaks the unit suites can't: driver wiring, codec state
handoff, bundle writing, and the pre/post-codec PSNR equality that proves the
entropy codec is lossless end to end.
"""

import dataclasses
import os

import numpy as np

from cnc_tpu.config import (CNCConfig, EntropyConfig, ModelConfig,
                            RenderConfig, TrainConfig)
from cnc_tpu.data import scenes
from cnc_tpu.train import driver
import pytest

pytestmark = pytest.mark.slow


# PSNRs recorded by each pipeline test so whichever runs second can assert
# the single-device and multichip trainers land in the same quality regime
# (a silent training regression in either path shows up as a gap here long
# before the soft >5 dB floors would catch it)
_PSNRS = {}


def _cross_check(kind, psnr):
    _PSNRS[kind] = psnr
    if len(_PSNRS) == 2:
        a, b = _PSNRS["single40"], _PSNRS["multi24"]
        # 40 vs 24 steps differ by ~1-2 dB at this scale; 5 dB means one of
        # the two trainers effectively stopped learning
        assert abs(a - b) < 5.0, _PSNRS


def tiny_rd_config():
    return CNCConfig(
        model=ModelConfig(n_features_per_level=2, n_neurons=32,
                          resolutions_3d=(10, 18, 34, 66),
                          resolutions_2d=(18, 34),
                          log2_hashmap_size=10, log2_hashmap_size_2D=8,
                          pe_num_freqs=4),
        entropy=EntropyConfig(n_features=2, sample_num=256,
                              max_context_layer_num=2, Pg_level=4,
                              Pg_level_2D=2, skip_levels_3d=(0, 1),
                              skip_levels_2d=(0,), Rb=16,
                              pn_coords_cap=1 << 14, pn_frac_sample_cap=None,
                              sample_num_2d=128, v_ctx_cap=1 << 11,
                              max_points_per_chunk=1 << 14),
        render=dataclasses.replace(
            RenderConfig(), render_step_size=0.05, occ_resolution=16,
            occ_warmup_steps=8, sample_budget=1 << 10, march_block=16,
            eval_chunk_rays=1024),
        train=dataclasses.replace(
            TrainConfig(), init_batch_size=128, min_ray_bucket=128,
            max_ray_bucket=512, target_sample_batch_size=1 << 10,
            lmbda=2e-3, warmup_iters=10, lr_milestones=(30,), lr=6e-3),
    )


def test_run_pipeline_end_to_end(tmp_path):
    cfg = tiny_rd_config()
    ds = scenes.ProceduralDataset("sphere", n_images=4, width=32, height=32,
                                  n_steps_gt=64)
    res = driver.run_pipeline(cfg, ds, ds, scene="tiny",
                              out_root=str(tmp_path), max_steps=40,
                              max_eval_images=1, log_fn=lambda *a: None)

    assert np.isfinite(res.psnr) and res.psnr > 5.0
    _cross_check("single40", res.psnr)
    # losslessness: decoding the bitstream reproduces the binarized tables the
    # pre-codec eval rendered with (driver :442-506) up to context coverage;
    # PSNR must match to float noise.  Measured delta at this config is
    # 0.0000 dB at 40/150/300 steps (2026-08-17 probe); 0.05 is headroom
    # for platform noise only — a real codec leak fails this.
    assert abs(res.psnr - res.psnr_codec) < 0.05, (res.psnr, res.psnr_codec)
    assert res.embed_MB_codec > 0
    # analytic rate estimate vs actually coded bytes (SURVEY §4 cross-check).
    # Measured 7.5-8% at 40-300 steps on this tiny config (clamped
    # probabilities on a barely-trained model); trained flagship runs agree
    # to ~1.5% (RESULTS.md).
    assert abs(res.embed_MB_est - res.embed_MB_codec) / res.embed_MB_codec \
        < 0.15, (res.embed_MB_est, res.embed_MB_codec)
    assert res.quant_results and np.isfinite(res.quant_results[0]["psnr"])

    # bitstream + self-contained bundle on disk
    sdir = os.path.join(str(tmp_path), "bitstreams", "tiny")
    names = os.listdir(sdir)
    assert any(n.startswith("b_3D") for n in names)
    assert any(n.startswith("b_xy") for n in names)
    assert "meta.npz" in names

    driver.append_result_row(res, "tiny", "procedural", out_root=str(tmp_path))
    out = open(os.path.join(str(tmp_path), "results", "procedural",
                            "output.txt")).read().strip().split("\t")
    assert out[0] == "tiny" and len(out) > 12

    # ---- self-contained bundle: rebuild EVERYTHING from disk only (fresh
    # objects — the process-restart equivalent), decode, render, and match
    # the post-codec PSNR (no reference counterpart: it decodes in-process
    # with Pg scalars/model weights still in memory, SURVEY §5)
    import jax.numpy as jnp
    from cnc_tpu.render import renderer
    from cnc_tpu.utils import metrics as M

    params, binaries, bcfg = driver.decode_bundle(sdir,
                                                  log_fn=lambda *a: None)
    rays, gt = ds.image_and_rays(0)
    rgb, _, _ = renderer.render_image(
        params, bcfg.model, bcfg.render, jnp.asarray(bcfg.render.aabb),
        binaries, rays.origins, rays.viewdirs, jnp.ones((3,)))
    psnr_bundle = float(M.psnr(rgb, gt))
    assert abs(psnr_bundle - res.psnr_codec) < 1e-3, (psnr_bundle,
                                                      res.psnr_codec)


def test_run_pipeline_multichip(tmp_path):
    """Same pipeline through the data-parallel trainer on the 8-device CPU
    mesh — per-device entropy quotas, sharded rays, then codec as usual."""
    from cnc_tpu.parallel.sharding import make_mesh

    cfg = tiny_rd_config()
    ds = scenes.ProceduralDataset("sphere", n_images=4, width=32, height=32,
                                  n_steps_gt=64)
    res = driver.run_pipeline(cfg, ds, ds, scene="tiny8",
                              out_root=str(tmp_path), max_steps=24,
                              max_eval_images=1, mesh=make_mesh(8),
                              log_fn=lambda *a: None)
    assert np.isfinite(res.psnr)
    _cross_check("multi24", res.psnr)
    # same 0.0000 dB measured delta as the single-device pipeline (the codec
    # path is identical; only training is sharded)
    assert abs(res.psnr - res.psnr_codec) < 0.05, (res.psnr, res.psnr_codec)
    assert res.embed_MB_codec > 0


def test_reset_state_reuses_compiles_and_reproduces(tmp_path):
    """Trainer.reset_state (the in-process RD-sweep primitive,
    tools/rd_sweep_depth.py) must (a) keep every compiled program — λ and
    rate_update_interval enter the rate jits only as the runtime scale
    scalar — and (b) reproduce a fresh same-seed run bit-for-bit, so a
    multi-point sweep is equivalent to independent processes (the
    reference's fixed seed-42 protocol, train_CNC_nerf_synthetic.py:136)."""
    from cnc_tpu.train.trainer import Trainer

    cfg = tiny_rd_config()
    ds = scenes.ProceduralDataset("sphere", n_images=4, width=32, height=32,
                                  n_steps_gt=64)
    entropy = driver.build_entropy(cfg)
    tr = Trainer(cfg, ds, entropy=entropy)
    quiet = lambda *a: None
    res_a = driver.run_with_trainer(tr, ds, scene="rs_a",
                                    out_root=str(tmp_path), max_steps=12,
                                    max_eval_images=1, log_fn=quiet)

    jits_after_a = dict(tr._jit_cache)
    scale_a = tr._rate_scale()
    tr.reset_state(lmbda=4e-3, rate_update_interval=2)
    assert tr.step == 0 and tr.num_rays == cfg.train.init_batch_size
    assert tr.cfg.train.lmbda == 4e-3
    assert tr.cfg.train.rate_update_interval == 2
    # λ·K/total: 2x from λ and 2x from K
    assert np.isclose(tr._rate_scale(), scale_a * 4.0)
    # the jit cache survives the reset untouched (same function objects)
    for k, v in jits_after_a.items():
        assert tr._jit_cache.get(k) is v, k

    # reset back to the original point: identical run, zero recompiles
    tr.reset_state(lmbda=cfg.train.lmbda, rate_update_interval=1)
    res_b = driver.run_with_trainer(tr, ds, scene="rs_b",
                                    out_root=str(tmp_path), max_steps=12,
                                    max_eval_images=1, log_fn=quiet)
    assert res_b.psnr == res_a.psnr, (res_a.psnr, res_b.psnr)
    assert res_b.embed_MB_codec == res_a.embed_MB_codec
    for k, v in jits_after_a.items():
        assert tr._jit_cache.get(k) is v, k
