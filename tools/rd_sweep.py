#!/usr/bin/env python
"""Short-depth RD sweep over the TPU sampling adaptations.

The entropy rate estimate is a sampled estimator; its per-step cost on TPU is
set by STATIC sampling capacities (EntropyConfig.v_ctx_cap, sample_num,
sample_num_2d, pn_frac_sample_cap — config.py) that were sized conservatively
in round 1.  This sweep trains the flagship architecture at short depth for a
grid of scale factors on those knobs and records PSNR / analytic rate /
steady step time, to pick the best speed-quality point on real hardware.

One subprocess per config (clean HBM + jit caches); one JSON line per config
appended to the output file.

Usage:  python tools/rd_sweep.py [--steps 200] [--scales 1.0,0.5,0.25]
        [--out /tmp/rd_sweep.jsonl]
Tokens: "ng" prefix = ctx_grad off; "@K" suffix = rate_update_interval K
        (e.g. "ng0.5@2" = half caps, no ctx grads, rate every 2nd step).
"""

import argparse
import json
import os
import subprocess
import sys
import time


def run_one(scale: float, steps: int, ctx_grad: bool = True,
            rate_interval: int = 1) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import dataclasses
    import jax
    from cnc_tpu.config import (CNCConfig, EntropyConfig, ModelConfig,
                                RenderConfig, TrainConfig)
    from cnc_tpu.data import scenes
    from cnc_tpu.train import driver
    from cnc_tpu.train.trainer import Trainer

    e = EntropyConfig(n_features=4, sample_num=100000)
    e = dataclasses.replace(
        e,
        sample_num=max(1024, int(e.sample_num * scale)),
        v_ctx_cap=max(1 << 16, int(e.v_ctx_cap * scale)),
        sample_num_2d=max(4096, int(e.sample_num_2d * scale)),
        pn_frac_sample_cap=max(1 << 16, int(e.pn_frac_sample_cap * scale)),
        ctx_grad=ctx_grad)
    cfg = CNCConfig(
        model=ModelConfig(n_features_per_level=4),
        entropy=e,
        render=RenderConfig(),
        train=dataclasses.replace(TrainConfig(), lmbda=2e-3,
                                  init_batch_size=4096,
                                  min_ray_bucket=4096, max_ray_bucket=4096,
                                  rate_update_interval=rate_interval),
    )
    ds = scenes.ProceduralDataset("blocks", n_images=8, width=128, height=128,
                                  n_steps_gt=256)
    t0 = time.time()
    entropy = driver.build_entropy(cfg)
    tr = Trainer(cfg, ds, entropy=entropy)
    tr.warm_compile(log_fn=lambda m: print(m, file=sys.stderr, flush=True))
    setup_s = time.time() - t0
    tr.fit(max_steps=steps - 17, log_every=100)
    t0 = time.time()
    s0 = tr.step
    tr.fit(max_steps=steps - 1, log_every=0)
    step_s = (time.time() - t0) / max(1, tr.step - s0)
    ev = tr.evaluate(max_images=1)
    # analytic rate at the final parameters (same estimator the codec verifies)
    import jax.numpy as jnp
    from cnc_tpu.models import radiance_field as rf
    tables = rf.quantized_tables(tr.params, cfg.model)
    bpp, mb = entropy.rate_estimate(
        tr.ent_params, tables, tr.occ_state.binaries,
        jax.random.PRNGKey(7), tr._last_ent_cache, entropy.table_arrays)
    return {"scale": scale, "ctx_grad": ctx_grad,
            "rate_interval": rate_interval, "steps": steps,
            "psnr": round(ev["psnr"], 3),
            "embed_MB": round(float(mb), 4),
            "bits_per_param": round(float(bpp), 4),
            "step_s": round(step_s, 3), "setup_s": round(setup_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--scales", type=str, default="1.0,0.5,0.25")
    ap.add_argument("--out", type=str, default="/tmp/rd_sweep.jsonl")
    args = ap.parse_args()

    if os.environ.get("CNC_SWEEP_SCALE"):
        r = run_one(float(os.environ["CNC_SWEEP_SCALE"]),
                    int(os.environ["CNC_SWEEP_STEPS"]),
                    ctx_grad=os.environ.get("CNC_SWEEP_CTXGRAD", "1") == "1",
                    rate_interval=int(os.environ.get("CNC_SWEEP_RI", "1")))
        print(json.dumps(r), flush=True)
        return

    # a scale prefixed "ng" additionally sets ctx_grad=False (e.g. "ng1.0");
    # a "@K" suffix sets rate_update_interval=K (e.g. "1.0@2", "ng0.5@4")
    for tok in args.scales.split(","):
        ng = tok.startswith("ng")
        tok = tok[2:] if ng else tok
        ri = 1
        if "@" in tok:
            tok, ri_s = tok.split("@", 1)
            ri = int(ri_s)
        s = float(tok)
        env = dict(os.environ, CNC_SWEEP_SCALE=str(s),
                   CNC_SWEEP_STEPS=str(args.steps),
                   CNC_SWEEP_CTXGRAD="0" if ng else "1",
                   CNC_SWEEP_RI=str(ri))
        print(f"=== scale {s} ===", file=sys.stderr, flush=True)
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True)
        sys.stderr.write(p.stderr[-2000:])
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        if line:
            with open(args.out, "a") as f:
                f.write(line + "\n")
            print(line, flush=True)
        else:
            print(f"scale {s} failed rc={p.returncode}", file=sys.stderr)


if __name__ == "__main__":
    main()
