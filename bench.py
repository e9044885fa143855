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

import collections
import json
import os
import sys
import time

BASELINE_SAMPLES_PER_SEC = 20000 * (1 << 18) / 3600.0

_T_START = time.time()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _emit(sps: float, note: str = ""):
    if note:
        log(f"bench: {note}")
    print(json.dumps({
        "metric": "rd_train_throughput",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_SEC, 4),
    }), flush=True)


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
            # rc 0 so the harness records the zero measurement rather than
            # discarding the run as a crash
            _emit(0.0, f"watchdog: device backend unreachable after "
                       f"{wd_s:.0f}s; emitting zero record")
            os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    # Driver-window deadline: the harness killed round 1's bench at rc=124
    # with no JSON after a 1033 s contended table build (window ~= 20 min).
    # A live estimate is maintained from per-step wall times as soon as the
    # first warm steps run; if the deadline arrives before the official
    # measurement completes, the best-available estimate is emitted (zero if
    # tables/compiles ate the whole window) so the run is always recorded as
    # a measurement rather than a timeout.
    deadline_s = float(os.environ.get("CNC_BENCH_DEADLINE_S", "1050"))
    estimate = {"sps": 0.0, "n": 0}
    done = threading.Event()

    def _deadline():
        if not done.wait(timeout=max(1.0, _T_START + deadline_s
                                     - time.time())):
            _emit(estimate["sps"],
                  f"deadline {deadline_s:.0f}s hit; partial estimate over "
                  f"{estimate['n']} warm steps")
            os._exit(0)

    threading.Thread(target=_deadline, daemon=True).start()
    log("bench devices:", jax.devices())
    devices_seen.set()
    cfg = CNCConfig(
        model=ModelConfig(n_features_per_level=4),
        # ctx_grad=False stop-gradients the context-feature gathers in the
        # rate estimate (the dominant scatter of the 3D rate grad).  RD
        # validation: 200-step TPU sweep (RESULTS.md round 2: -0.36 dB,
        # -4.5% bits) and 2000-step full-pipeline sweep (round 3,
        # runs_cpu_knobs) both place it on the RD curve.
        entropy=EntropyConfig(n_features=4, sample_num=100000,
                              ctx_grad=False),
        # visible_frac stays OFF: the 2000-step validation sweep measured
        # −1.14 dB at visible_frac=0.3 (prune-buffer overflow masks rays out
        # of the loss; RESULTS.md round-3 session 4) — not an on-curve knob
        # at that capacity, so the bench does not use it.
        render=RenderConfig(),
        # pin the ray bucket to the measured steady value (4096 on this
        # scene): the throughput of the step is what's measured, and letting
        # the dynamic batcher wander pays a fresh multi-minute render-grad
        # compile through the tunneled backend for every new bucket it visits
        # rate_update_interval=4 applies the entropy-rate gradients every
        # 4th step with λ·K compensation (trainer.py).  At 200-step depth
        # this lags the annealing schedule badly (round-2 sweep: off-curve);
        # at 2000-step depth the full-pipeline sweep puts it on the curve
        # (round 3, runs_cpu_knobs: +0.24 dB, +9% bits at termination-noise-
        # dominated sizes vs the K=1 anchor).  The library default stays
        # reference-faithful (K=1, rate every step like the reference's
        # driver :383); the bench measures the validated fast configuration.
        train=dataclasses.replace(TrainConfig(), lmbda=2e-3,
                                  init_batch_size=4096,
                                  min_ray_bucket=4096, max_ray_bucket=4096,
                                  rate_update_interval=4),
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
    batch = cfg.train.target_sample_batch_size

    # per-step wall times via the fit() callback (the fit loop host-syncs
    # every step, so callback-to-callback wall time is true step latency)
    step_dt = {}
    rolling = collections.deque(maxlen=measure)
    t_prev = [time.time()]

    def on_step(s):
        now = time.time()
        step_dt[s] = now - t_prev[0]
        t_prev[0] = now
        if s >= 4:   # warm_compile already built the programs; the first
            rolling.append(step_dt[s])   # steps still pay stragglers
            if len(rolling) >= 4:
                estimate["sps"] = len(rolling) * batch / sum(rolling)
                estimate["n"] = len(rolling)

    t0 = time.time()
    tr.fit(max_steps=warmup + measure - 1, log_every=0, step_callback=on_step)
    done.set()
    dt_all = time.time() - t0
    meas = [step_dt[s] for s in range(warmup, warmup + measure)
            if s in step_dt]
    dt = sum(meas)
    sps = len(meas) * batch / dt
    log(f"{tr.step} steps in {dt_all:.1f}s; measured {len(meas)} steps "
        f"in {dt:.2f}s -> {sps/1e3:.1f}k samples/s "
        f"({dt/len(meas)*1e3:.0f} ms/step)")
    _emit(sps)


if __name__ == "__main__":
    main()
