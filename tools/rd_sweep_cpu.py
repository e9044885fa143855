#!/usr/bin/env python
"""CPU-scale RD sweep at depth: curve-SHAPE evidence when no TPU is up.

Runs the full pipeline (train -> encode -> decode -> re-eval -> quantize,
train/driver.py:run_pipeline) at a toy-but-trained scale for several
lambdas, writing the standard TSV rows.  This is NOT a flagship RD point —
the grids/scene are small — but 2,000 steps is past the entropy model's
undertrained regime, so it shows the things an RD curve must show:
monotone size/quality tradeoff in lambda, near-zero codec delta at every
point, and analytic-vs-coded size agreement (reference anchor: the lambda
sweep protocol of train_CNC_nerf_synthetic.py:71-133 + BASELINE.md).

    nice -n 19 python tools/rd_sweep_cpu.py --steps 2000 \
        --lmbdas 7e-4,1e-3,2e-3,4e-3
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")   # sitecustomize imports jax first

from cnc_tpu.config import (CNCConfig, EntropyConfig, ModelConfig,
                            RenderConfig, TrainConfig)
from cnc_tpu.data import scenes
from cnc_tpu.train import driver


def parse_points(spec):
    """Token grammar: LMBDA[@K][/CG][v] — K = rate_update_interval,
    CG = ctx_grad (1 default), trailing 'v' = visibility-pruned render
    (RenderConfig.visible_frac = --visible_frac).  Examples:
    "2e-3"  "2e-3@4/0"  "2e-3@4/0v"."""
    pts = []
    for tok in spec.split(","):
        tok = tok.strip()
        vf = tok.endswith("v")
        if vf:
            tok = tok[:-1]
        tok, _, cg = tok.partition("/")
        lm, _, k = tok.partition("@")
        pts.append((float(lm), int(k) if k else 1,
                    bool(int(cg)) if cg else True, vf))
    return pts


def sweep_config(lmbda: float, steps: int, size: str = "small") -> CNCConfig:
    """tests/test_pipeline.tiny_rd_config scaled to a real depth: the LR
    schedule keeps the reference's proportions (warmup 5%, decays at
    45/60/75/85/95% of max_steps, driver :167-294).

    size='small' uses grids big enough that coded table bits (tens of KB)
    dominate the per-stream coder overhead — 'tiny' sizes measured sub-KB
    streams where termination bytes are ~20% of the total and the curve
    shape drowns."""
    ms = tuple(int(steps * f) for f in (0.45, 0.6, 0.75, 0.85, 0.95))
    if size == "tiny":
        res3, res2, h3, h2 = (10, 18, 34, 66), (18, 34), 10, 8
        budget = 1 << 11
    else:
        res3, res2, h3, h2 = (10, 18, 34, 66, 130), (18, 34, 66), 12, 10
        budget = 1 << 12
    return CNCConfig(
        model=ModelConfig(n_features_per_level=2, n_neurons=32,
                          resolutions_3d=res3,
                          resolutions_2d=res2,
                          log2_hashmap_size=h3, log2_hashmap_size_2D=h2,
                          pe_num_freqs=4),
        entropy=EntropyConfig(n_features=2, sample_num=1024,
                              max_context_layer_num=2, Pg_level=len(res3),
                              Pg_level_2D=len(res2), skip_levels_3d=(0, 1),
                              skip_levels_2d=(0,), Rb=16,
                              pn_coords_cap=1 << 15, pn_frac_sample_cap=None,
                              sample_num_2d=512, v_ctx_cap=1 << 12,
                              max_points_per_chunk=1 << 15),
        render=dataclasses.replace(
            RenderConfig(), render_step_size=0.03, occ_resolution=16,
            occ_warmup_steps=64, sample_budget=budget, march_block=16,
            eval_chunk_rays=2048),
        train=dataclasses.replace(
            TrainConfig(), init_batch_size=256, min_ray_bucket=256,
            max_ray_bucket=2048, target_sample_batch_size=budget,
            lmbda=lmbda, warmup_iters=max(10, steps // 20),
            lr_milestones=ms, lr=6e-3),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--points", type=str, default="7e-4,1e-3,2e-3,4e-3",
                    help="see parse_points: LMBDA[@K][/CG][v] tokens")
    ap.add_argument("--visible_frac", type=float, default=0.3,
                    help="visible_frac applied to points carrying the "
                         "'v' suffix")
    ap.add_argument("--size", type=str, default="small",
                    choices=["tiny", "small"])
    ap.add_argument("--v_ctx_cap", type=int, default=None,
                    help="override EntropyConfig.v_ctx_cap for every point "
                         "(ROOFLINE lever #2 validation: shrink the sampled "
                         "3D ctx-vertex budget and check the RD point stays "
                         "on-curve)")
    ap.add_argument("--out_root", type=str, default=".")
    args = ap.parse_args()

    ds = scenes.ProceduralDataset("blocks", n_images=12, width=96, height=96,
                                  n_steps_gt=192)
    test = scenes.ProceduralDataset("blocks", n_images=4, width=96, height=96,
                                    split="test", n_steps_gt=192)
    for lmbda, k, cg, vf in parse_points(args.points):
        cfg = sweep_config(lmbda, args.steps, args.size)
        cfg = dataclasses.replace(
            cfg,
            entropy=dataclasses.replace(
                cfg.entropy, ctx_grad=cg,
                **({"v_ctx_cap": args.v_ctx_cap}
                   if args.v_ctx_cap is not None else {})),
            render=dataclasses.replace(
                cfg.render,
                visible_frac=args.visible_frac if vf else None),
            train=dataclasses.replace(cfg.train, rate_update_interval=k))
        scene = (f"cpu_rd_{args.size}_l{lmbda:g}_k{k}_cg{int(cg)}"
                 + ("_vf" if vf else "")
                 + (f"_cap{args.v_ctx_cap}" if args.v_ctx_cap is not None
                    else ""))
        t0 = time.time()
        res = driver.run_pipeline(
            cfg, ds, test, scene=scene, out_root=args.out_root,
            max_steps=args.steps, max_eval_images=4,
            log_fn=lambda *a: print(f"[{scene}]", *a, flush=True))
        driver.append_result_row(res, scene, "Procedural-CPU-RD",
                                 out_root=args.out_root)
        print(f"[{scene}] lambda={lmbda:g} K={k} ctx_grad={int(cg)} "
              f"vf={args.visible_frac if vf else None} steps={args.steps} "
              f"psnr={res.psnr:.2f} codec={res.psnr_codec:.2f} "
              f"size={res.total_size_MB():.4f}MB "
              f"est={res.embed_MB_est:.4f} coded={res.embed_MB_codec:.4f} "
              f"wall={time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
