#!/usr/bin/env python
"""Reference-depth RD sweep in ONE process (VERDICT r2 #2/#3).

Runs the full acceptance pipeline (train -> eval -> encode -> decode ->
re-eval -> 13-bit MLP quantize -> TSV row) for a chain of (λ, rate-update
interval K) points at ≥2,000-step depth on the flagship architecture,
reusing one Trainer's compiled programs and one entropy-table build across
every point (Trainer.reset_state): the tunneled TPU backend cannot
serialize executables, so per-process points would each repay ~5-10 min of
fixed cost.

Point grammar: "2e-3@1,2e-3@2,4e-3@2,1e-3@2,7e-4@2" — λ@K tokens.  When
--auto_fallback is on (default) and the chain contains a K>1 point with the
same λ as an earlier K=1 point, the K>1 point is validated against the K=1
anchor (ΔPSNR ≥ -0.1 dB, embed_MB ≤ +6%); on failure every remaining K>1
token is demoted to K=1 (the reference updates the rate loss every step,
train_CNC_nerf_synthetic.py:383 — K>1 is this framework's speed knob and
must earn its place on the RD curve).

A wall deadline (--deadline_s, measured from process start) bounds the
chain: before each point the expected cost (measured s/step of the closest
prior point x steps + codec/eval tail) is checked against the remaining
budget and the point is skipped with a log line if it does not fit.

Anchor for λ=2e-3: the round-2 faithful-defaults deep run (RESULTS.md,
38.035 dB post-codec / 1.9667 MB coded at 2,000 steps, ctx_grad=True, K=1).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

_T0 = time.time()

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))


def log(*a):
    print(f"[{time.time() - _T0:8.1f}s]", *a, flush=True)


def parse_points(spec):
    pts = []
    for tok in spec.split(","):
        tok = tok.strip()
        lm, _, k = tok.partition("@")
        pts.append((float(lm), int(k) if k else 1))
    return pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=str,
                    default="2e-3@1,2e-3@2,4e-3@2,1e-3@2,7e-4@2")
    ap.add_argument("--max_steps", type=int, default=2000)
    ap.add_argument("--sample_num", type=int, default=100000)
    ap.add_argument("--n_features", type=int, default=4)
    ap.add_argument("--ctx_grad", type=int, default=0,
                    help="0 (default): the ng setting under validation")
    ap.add_argument("--visible_frac", type=float, default=None,
                    help="visibility-pruned render eval capacity fraction "
                         "(renderer.render_rays_train); None = off")
    ap.add_argument("--deadline_s", type=float, default=1e9,
                    help="wall budget from process start; points that do "
                         "not fit are skipped")
    ap.add_argument("--margin_s", type=float, default=900.0,
                    help="reserve this much of the budget for the tail "
                         "(codec + eval of the final point)")
    ap.add_argument("--out_root", type=str, default="runs_depth")
    ap.add_argument("--max_eval_images", type=int, default=1)
    ap.add_argument("--auto_fallback", type=int, default=1)
    ap.add_argument("--pin_bucket", type=int, default=0,
                    help="pin the ray bucket (min==max) so the dynamic "
                         "batcher never pays a fresh multi-minute "
                         "render-grad compile mid-chain; 0 = reference "
                         "dynamic batching")
    ap.add_argument("--sample_budget", type=int, default=0,
                    help="per-step sample budget (0 = reference 2^18); "
                         "reduced budgets trade samples/step for steps/s "
                         "so the 20k-step schedule fits a driver window")
    ap.add_argument("--v_ctx_cap", type=int, default=0,
                    help="override EntropyConfig.v_ctx_cap (0 = default "
                         "2^21). ctx_util in the train log measured ~0.26 "
                         "at steady state on the flagship depth run, so "
                         "2^20 is the candidate for the round-5 cap-shrink "
                         "RD validation (ROOFLINE lever #2)")
    ap.add_argument("--pn_frac_cap", type=int, default=0,
                    help="override EntropyConfig.pn_frac_sample_cap (0 = "
                         "default 2^21).  ROOFLINE 2.1 lever: the "
                         "dimension-wise prior histogram is 73%% of rate2d; "
                         "2^19 cuts it ~4x.  RD-validate before adopting.")
    ap.add_argument("--v_ctx_cap_2d", type=int, default=0,
                    help="override EntropyConfig.v_ctx_cap_2d (0 = default "
                         "None = full windows).  ROOFLINE 2.1 lever: the "
                         "fill-sized cap (~2^17) compacts every plane "
                         "window; drops rows beyond the budget, so "
                         "RD-validate before adopting.")
    ap.add_argument("--point_ckpt_every", type=int, default=500,
                    help="per-point checkpoint interval in steps (0 = off). "
                         "Every point writes <out_root>/ckpt_<tag>.npz; a "
                         "restarted process resumes the in-flight point from "
                         "it (watchdog restarts after a relay hang lose at "
                         "most this many steps) and the file is deleted when "
                         "the point's summary row lands.  The 20k schedule "
                         "run spans driver windows through the same file.")
    args = ap.parse_args()

    from cnc_tpu.utils.jit_cache import ensure_compilation_cache
    ensure_compilation_cache()
    import jax
    from cnc_tpu.config import (CNCConfig, EntropyConfig, ModelConfig,
                                RenderConfig, TrainConfig)
    from cnc_tpu.data.scenes import ProceduralDataset
    from cnc_tpu.train import driver
    from cnc_tpu.train.trainer import Trainer

    points = parse_points(args.points)
    log("points:", points, "devices:", jax.devices())

    render_kw = dict(visible_frac=args.visible_frac)
    if args.sample_budget:
        render_kw["sample_budget"] = args.sample_budget
    train_kw = dict(lmbda=points[0][0],
                    rate_update_interval=points[0][1],
                    max_steps=args.max_steps)
    if args.pin_bucket:
        train_kw.update(init_batch_size=args.pin_bucket,
                        min_ray_bucket=args.pin_bucket,
                        max_ray_bucket=args.pin_bucket)
    if args.sample_budget:
        train_kw["target_sample_batch_size"] = args.sample_budget
    cfg = CNCConfig(
        model=ModelConfig(n_features_per_level=args.n_features),
        entropy=EntropyConfig(n_features=args.n_features,
                              sample_num=args.sample_num,
                              ctx_grad=bool(args.ctx_grad),
                              **({"v_ctx_cap": args.v_ctx_cap}
                                 if args.v_ctx_cap else {}),
                              **({"pn_frac_sample_cap": args.pn_frac_cap}
                                 if args.pn_frac_cap else {}),
                              **({"v_ctx_cap_2d": args.v_ctx_cap_2d}
                                 if args.v_ctx_cap_2d else {})),
        render=dataclasses.replace(RenderConfig(), **render_kw),
        train=dataclasses.replace(TrainConfig(), **train_kw),
    )
    # the round-2 deep-run dataset (train_cnc_nerf_synthetic.py fallback)
    train_ds = ProceduralDataset("blocks", n_images=24, width=256,
                                 height=256, split="train")
    test_ds = ProceduralDataset("blocks", n_images=8, width=256, height=256,
                                split="test")

    t0 = time.time()
    entropy = driver.build_entropy(cfg)
    log(f"entropy tables built in {time.time() - t0:.1f}s")
    trainer = Trainer(cfg, train_ds, entropy=entropy)
    trainer.warm_compile(log_fn=log)

    os.makedirs(args.out_root, exist_ok=True)
    summary_path = os.path.join(args.out_root, "summary.jsonl")
    done = {}
    if os.path.exists(summary_path):
        with open(summary_path) as fh:
            for line in fh:
                rec = json.loads(line)
                done[(rec["lmbda"], rec["interval"])] = rec
        log(f"resuming: {len(done)} completed points in {summary_path}")

    step_s = {}     # interval -> measured s/step
    tail_s = 600.0  # eval + encode + decode + quant estimate, refined
    anchor = None   # first K=1 result per λ for auto-fallback
    fallback = False

    for i, (lm, k) in enumerate(points):
        if fallback and k > 1:
            log(f"point {lm:g}@{k}: K>1 demoted to K=1 (failed validation)")
            k = 1
        if (lm, k) in done:
            rec = done[(lm, k)]
            log(f"point {lm:g}@{k}: already done "
                f"(psnr_codec={rec['psnr_codec']:.3f})")
            if k == 1 and anchor is None:
                anchor = rec
            continue
        tag = f"l{lm:g}_k{k}"
        ck = os.path.join(args.out_root, f"ckpt_{tag}.npz")
        ck_step = 0
        if args.point_ckpt_every and os.path.exists(ck):
            import numpy as _np
            ck_step = int(_np.load(ck)["step"])
        est_step = step_s.get(k) or step_s.get(1) or (
            5.6 if k == 1 else 3.8)   # prior: round-2 measurements
        est = est_step * (args.max_steps + 1 - ck_step) + tail_s
        left = args.deadline_s - (time.time() - _T0) - args.margin_s
        if est > left and args.point_ckpt_every == 0:
            log(f"point {lm:g}@{k}: SKIPPED — est {est:.0f}s > "
                f"remaining {left:.0f}s")
            continue

        log(f"=== point {i}: λ={lm:g} K={k} -> {tag} "
            f"(est {est/60:.0f} min) ===")
        trainer.reset_state(lmbda=lm, rate_update_interval=k)
        if args.point_ckpt_every:
            trainer.cfg = dataclasses.replace(
                trainer.cfg, train=dataclasses.replace(
                    trainer.cfg.train, checkpoint_path=ck,
                    checkpoint_every=args.point_ckpt_every))
            if ck_step > 0:
                from cnc_tpu.utils import checkpoint as ckpt_mod
                ckpt_mod.load_checkpoint(ck, trainer)
                log(f"resumed {tag} from checkpoint at step {trainer.step}")
        t_pt = time.time()
        # log every 50 steps: the overnight watchdog keys on log staleness
        # and host-core contention can stretch a 200-step gap past it
        res = driver.run_with_trainer(
            trainer, test_ds, scene=tag, out_root=args.out_root,
            max_steps=args.max_steps, max_eval_images=args.max_eval_images,
            log_fn=log, log_every=50)
        driver.append_result_row(res, tag, "Procedural_depth",
                                 out_root=args.out_root)
        wall = time.time() - t_pt
        steps_run = max(args.max_steps + 1 - ck_step, 1)
        step_s[k] = res.elapsed_train_s / steps_run
        tail_s = max(120.0, wall - res.elapsed_train_s)
        rec = {
            "lmbda": lm, "interval": k, "ctx_grad": bool(args.ctx_grad),
            "visible_frac": args.visible_frac,
            "steps": args.max_steps,
            "psnr": round(res.psnr, 4), "psnr_codec": round(res.psnr_codec, 4),
            "delta_codec_db": round(res.psnr_codec - res.psnr, 4),
            "embed_MB_est": round(res.embed_MB_est, 4),
            "embed_MB_codec": round(res.embed_MB_codec, 4),
            "total_MB": round(res.total_size_MB(), 4),
            "compression_x": round(res.compression_x(), 2),
            "ssim": round(res.ssim, 4), "ssim_codec": round(res.ssim_codec, 4),
            "psnr_mlp_q13": round(res.quant_results[0]["psnr"], 4),
            "train_s": round(res.elapsed_train_s, 1),
            "encode_s": round(res.encode_s, 1),
            "decode_s": round(res.decode_s, 1),
            "step_s": round(step_s[k], 3), "wall_s": round(wall, 1),
        }
        with open(summary_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        if args.point_ckpt_every and os.path.exists(ck):
            os.remove(ck)   # the summary row supersedes the checkpoint
        log("point done:", json.dumps(rec))

        if k == 1 and anchor is None:
            anchor = rec
        elif (k > 1 and args.auto_fallback and anchor is not None
              and lm == anchor["lmbda"]):
            dpsnr = rec["psnr_codec"] - anchor["psnr_codec"]
            dbits = (rec["embed_MB_codec"] / max(anchor["embed_MB_codec"],
                                                 1e-9) - 1.0)
            ok = dpsnr >= -0.1 and dbits <= 0.06
            log(f"K={k} validation vs K=1 anchor: ΔPSNR={dpsnr:+.3f} dB, "
                f"Δbits={dbits:+.2%} -> {'ON-CURVE' if ok else 'OFF-CURVE'}")
            if not ok:
                fallback = True

    log("chain complete")


if __name__ == "__main__":
    sys.exit(main())
