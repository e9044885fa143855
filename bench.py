#!/usr/bin/env python
"""CNC-TPU benchmark: full rate-distortion training-step throughput.

Measures steady-state samples/second through the complete training step on
the flagship configuration (budgeted occupancy rendering + joint entropy
rate estimate + both optimizers), the workload that dominates the
reference's wall-clock (20k steps x 2^18 samples, SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no absolute wall-clock (BASELINE.md); CNC
training is reported by its authors at roughly an hour per scene on a
desktop GPU, i.e. 20000 * 2^18 / 3600s ~= 1.46M samples/s.  vs_baseline is
measured throughput divided by that figure.
"""

import json
import os
import sys
import time

BASELINE_SAMPLES_PER_SEC = 20000 * (1 << 18) / 3600.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np

    # this environment's sitecustomize imports jax at interpreter start,
    # BEFORE the env var above can register — set the config directly
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)

    from cnc_tpu.config import CNCConfig, EntropyConfig, ModelConfig, \
        RenderConfig, TrainConfig
    from cnc_tpu.data import scenes
    from cnc_tpu.train import driver
    from cnc_tpu.train.trainer import Trainer

    # If the tunneled TPU backend is unreachable, jax.devices() blocks
    # forever (no timeout in the plugin) and the bench would die on the
    # harness timeout without emitting its JSON line.  A watchdog emits an
    # honest zero-throughput record instead so the failure is recorded as a
    # measurement, not a parse error.
    import threading
    devices_seen = threading.Event()

    wd_s = float(os.environ.get("CNC_BENCH_WATCHDOG_S", "600"))

    def _watchdog():
        if not devices_seen.wait(timeout=wd_s):
            log(f"bench watchdog: device backend unreachable "
                f"after {wd_s:.0f}s")
            print(json.dumps({
                "metric": "rd_train_throughput",
                "value": 0.0,
                "unit": "samples/s",
                "vs_baseline": 0.0,
            }), flush=True)
            # rc 0 so the harness records the zero measurement rather than
            # discarding the run as a crash
            os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()
    log("bench devices:", jax.devices())
    devices_seen.set()
    cfg = CNCConfig(
        model=ModelConfig(n_features_per_level=4),
        entropy=EntropyConfig(n_features=4, sample_num=100000),
        render=RenderConfig(),
        # pin the ray bucket to the measured steady value (4096 on this
        # scene): the throughput of the step is what's measured, and letting
        # the dynamic batcher wander pays a fresh multi-minute render-grad
        # compile through the tunneled backend for every new bucket it visits
        train=dataclasses.replace(TrainConfig(), lmbda=2e-3,
                                  init_batch_size=4096,
                                  min_ray_bucket=4096, max_ray_bucket=4096),
    )
    t0 = time.time()
    ds = scenes.ProceduralDataset("blocks", n_images=8, width=128, height=128,
                                  n_steps_gt=256)
    log(f"dataset in {time.time()-t0:.1f}s")
    t0 = time.time()
    entropy = driver.build_entropy(cfg)
    log(f"entropy tables in {time.time()-t0:.1f}s")
    tr = Trainer(cfg, ds, entropy=entropy)
    tr.warm_compile(log_fn=log)   # concurrent compiles: wall ~ max, not sum

    warmup = 18   # past one occupancy refresh interval, all programs built
    measure = 16
    t0 = time.time()
    tr.fit(max_steps=warmup - 1, log_every=0)   # absolute: steps 0..warmup-1
    log(f"warmup {tr.step} steps in {time.time()-t0:.1f}s")
    t0 = time.time()
    step0 = tr.step
    tr.fit(max_steps=warmup + measure - 1, log_every=0)
    dt = time.time() - t0
    measure = tr.step - step0                   # exact steps timed
    sps = measure * cfg.train.target_sample_batch_size / dt
    log(f"{measure} steps in {dt:.2f}s -> {sps/1e3:.1f}k samples/s "
        f"({dt/measure*1e3:.0f} ms/step)")
    print(json.dumps({
        "metric": "rd_train_throughput",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
