#!/usr/bin/env python
"""On-hardware timing of the eval renderer's per-round sample budget.

The eval while_loop re-marches each alive ray's remaining lattice every
round (render/renderer.py:render_rays_eval); the reference's DDA resumes
incrementally from per-ray cursors (utils.py:395-479), so ITS small
per-round budgets were cheap while ours multiply the coarse march cost by
the round count.  `eval_samples_per_iter` (default 8) bounds round capacity
= chunk_rays * spi: a larger budget trades buffer size for fewer re-march
rounds.  CPU toy timing inverts the tradeoff (tiny hit counts, linear-cost
buffers), so the knob must be picked on the TPU at flagship march depth.

Trains 100 steps at lambda=0 (no entropy tables) on the 256^2 procedural
scene, then times a full test-image eval at spi in {8, 32, 64} and writes
the fastest to --choice_file (consumed by the overnight orchestrator to
configure the 1080p T&T eval).
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))

_T0 = time.time()


def log(*a):
    print(f"[{time.time() - _T0:7.1f}s]", *a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spis", type=str, default="8,32,64")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--choice_file", type=str, default="/tmp/eval_spi_choice")
    args = ap.parse_args()

    from cnc_tpu.utils.jit_cache import ensure_compilation_cache
    ensure_compilation_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp

    from cnc_tpu.config import CNCConfig, ModelConfig, RenderConfig, \
        TrainConfig
    from cnc_tpu.data.scenes import ProceduralDataset
    from cnc_tpu.render import renderer
    from cnc_tpu.train.trainer import Trainer

    log("devices:", jax.devices())
    cfg = CNCConfig(
        model=ModelConfig(n_features_per_level=4),
        render=RenderConfig(),
        train=dataclasses.replace(TrainConfig(), lmbda=0.0,
                                  init_batch_size=1024, min_ray_bucket=1024,
                                  max_ray_bucket=1024,
                                  target_sample_batch_size=65536),
    )
    ds = ProceduralDataset("blocks", n_images=24, width=256, height=256,
                           split="train")
    test = ProceduralDataset("blocks", n_images=2, width=256, height=256,
                             split="test")
    tr = Trainer(cfg, ds, entropy=None)
    tr.warm_compile(log_fn=log)
    tr.fit(max_steps=args.steps, log_every=50, log_fn=log)
    log("trained; profiling eval")

    rays, _ = test.image_and_rays(0)
    results = {}
    for spi in (int(s) for s in args.spis.split(",")):
        rcfg = dataclasses.replace(cfg.render, eval_samples_per_iter=spi)
        t0 = time.time()
        rgb, _, _ = renderer.render_image(
            tr.params, cfg.model, rcfg, tr.aabb, tr.occ_state.binaries,
            rays.origins, rays.viewdirs, jnp.ones(3))
        chk = float(jnp.sum(rgb))        # host-pulled sync (relay-safe)
        cold = time.time() - t0
        t0 = time.time()
        rgb, _, _ = renderer.render_image(
            tr.params, cfg.model, rcfg, tr.aabb, tr.occ_state.binaries,
            rays.origins, rays.viewdirs, jnp.ones(3))
        chk = float(jnp.sum(rgb))
        warm = time.time() - t0
        n_chunks = -(-rays.origins.shape[0] * rays.origins.shape[1]
                     // rcfg.eval_chunk_rays)
        results[spi] = warm
        log(f"spi={spi}: cold {cold:.1f}s warm {warm:.2f}s "
            f"({warm / n_chunks * 1e3:.0f} ms/chunk, chk {chk:.1f})")

    best = min(results, key=results.get)
    with open(args.choice_file, "w") as fh:
        fh.write(str(best))
    log(f"best spi={best} -> {args.choice_file}")
    print(json.dumps({"results_s": results, "best": best}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
