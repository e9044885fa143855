#!/usr/bin/env python
"""CNC-TPU benchmark: full rate-distortion training-step throughput.

Measures steady-state throughput of the complete training step on the
flagship configuration (budgeted occupancy rendering + joint entropy rate
estimate + both optimizers) in TWO configurations (VERDICT r3 #4):

  * fast     — the validated speed knobs (rate_update_interval=4,
               ctx_grad=False, v_ctx_cap=2^20; each on the RD curve at
               2000-step depth — RESULTS.md round 3 / runs_cpu_knobs for
               K and ctx_grad, runs_capval for the ctx-vertex cap);
  * faithful — reference-default semantics (rate gradients every step,
               context-feature gathers differentiated), the config whose
               objective matches the reference driver step for step
               (train_CNC_nerf_synthetic.py:302-366).

Prints ONE JSON line.  `value`/`vs_baseline` report the fast config
(continuity with BENCH_r01-03); the `faithful` / `fast` sub-records carry
per-config ms/step, nominal samples/s, and the MEASURED marched/rendered
samples per step (the nominal 2^18 is the reference's dynamic-batch target,
not what the scene yields — VERDICT r3 weak #1).

Baseline: the reference publishes no absolute wall-clock (BASELINE.md); CNC
training is reported by its authors at roughly an hour per scene on a
desktop GPU, i.e. 20000 * 2^18 / 3600s ~= 1.46M samples/s.
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


_RESULT = {
    "metric": "rd_train_throughput",
    "value": 0.0,
    "unit": "samples/s",
    "vs_baseline": 0.0,
    "note": "value/vs_baseline = fast config (K=4, ctx_grad=0, "
            "v_ctx_cap=2^20); see fast/faithful sub-records for "
            "measured samples",
    "fast": None,
    "faithful": None,
}


def _emit(note: str = ""):
    if note:
        log(f"bench: {note}")
    print(json.dumps(_RESULT), flush=True)


def _measure(tr, warmup, measure, batch, estimate, tag):
    """Run warmup+measure steps; returns the per-config record."""
    step_dt = {}
    stats = []
    rolling = collections.deque(maxlen=measure)
    t_prev = [time.time()]
    first = tr.step

    def on_step(s):
        now = time.time()
        step_dt[s] = now - t_prev[0]
        t_prev[0] = now
        if s >= first + 4:
            rolling.append(step_dt[s])
            if len(rolling) >= 4:
                estimate["sps"] = len(rolling) * batch / sum(rolling)
                estimate["n"] = len(rolling)

    aux_log = {}
    orig = tr._train_step

    def wrapped(bucket, rays, pixels, bkgd, key, ent_cache, log_fn=None):
        aux = orig(bucket, rays, pixels, bkgd, key, ent_cache, log_fn)
        stats.append((int(aux["n_marched"]), int(aux["n_samples"])))
        return aux

    tr._train_step = wrapped
    t0 = time.time()
    tr.fit(max_steps=first + warmup + measure - 1, log_every=0,
           step_callback=on_step)
    tr._train_step = orig
    dt_all = time.time() - t0
    meas = [step_dt[s] for s in range(first + warmup, first + warmup + measure)
            if s in step_dt]
    dt = sum(meas)
    sps = len(meas) * batch / dt if dt else 0.0
    tail = stats[warmup:]
    marched = sum(s[0] for s in tail) / max(len(tail), 1)
    rendered = sum(s[1] for s in tail) / max(len(tail), 1)
    rec = {
        "samples_per_s_nominal": round(sps, 1),
        "ms_per_step": round(dt / max(len(meas), 1) * 1e3, 1),
        "marched_samples_per_step": round(marched, 1),
        "rendered_samples_per_step": round(rendered, 1),
        "samples_per_s_marched": round(len(meas) * marched / dt, 1) if dt
        else 0.0,
        "steps_measured": len(meas),
    }
    log(f"{tag}: {tr.step - first} steps in {dt_all:.1f}s; measured "
        f"{len(meas)} steps in {dt:.2f}s -> {sps/1e3:.1f}k nominal "
        f"samples/s ({rec['ms_per_step']:.0f} ms/step; marched/step "
        f"{marched:.0f}, rendered/step {rendered:.0f})")
    return rec


def main():
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    import copy
    import dataclasses
    import jax

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
    # forever (no timeout in the plugin); a watchdog emits an honest
    # zero-throughput record so the failure is recorded as a measurement.
    import threading
    devices_seen = threading.Event()

    wd_s = float(os.environ.get("CNC_BENCH_WATCHDOG_S", "600"))

    def _watchdog():
        if not devices_seen.wait(timeout=wd_s):
            _emit(f"watchdog: device backend unreachable after {wd_s:.0f}s")
            os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    # Driver-window deadline (~20 min in round 1): if it arrives before the
    # official measurement completes, the best-available estimate is emitted
    # so the run is recorded as a measurement rather than a timeout.
    deadline_s = float(os.environ.get("CNC_BENCH_DEADLINE_S", "1050"))
    estimate = {"sps": 0.0, "n": 0}
    done = threading.Event()

    def _deadline():
        if not done.wait(timeout=max(1.0, _T_START + deadline_s
                                     - time.time())):
            if _RESULT["fast"] is None:
                _RESULT["value"] = round(estimate["sps"], 1)
                _RESULT["vs_baseline"] = round(
                    estimate["sps"] / BASELINE_SAMPLES_PER_SEC, 4)
            _emit(f"deadline {deadline_s:.0f}s hit; partial estimate over "
                  f"{estimate['n']} warm steps")
            os._exit(0)

    threading.Thread(target=_deadline, daemon=True).start()
    log("bench devices:", jax.devices())
    devices_seen.set()

    def make_cfg(rate_k: int, ctx_grad: bool, v_ctx_cap: int) -> CNCConfig:
        return CNCConfig(
            model=ModelConfig(n_features_per_level=4),
            entropy=EntropyConfig(n_features=4, sample_num=100000,
                                  ctx_grad=ctx_grad, v_ctx_cap=v_ctx_cap),
            render=RenderConfig(),
            # pin the ray bucket to the measured steady value (4096 on this
            # scene): letting the dynamic batcher wander pays a fresh
            # multi-minute render-grad compile through the tunneled backend
            # for every new bucket it visits
            train=dataclasses.replace(TrainConfig(), lmbda=2e-3,
                                      init_batch_size=4096,
                                      min_ray_bucket=4096,
                                      max_ray_bucket=4096,
                                      rate_update_interval=rate_k),
        )

    # fast adopts ROOFLINE lever #2 (ctx-vertex cap 2^20, RD-validated at
    # depth in runs_capval); faithful keeps the default 2^21 budget
    cfg_fast = make_cfg(4, False, 1 << 20)
    cfg_faith = make_cfg(1, True, 1 << 21)
    t0 = time.time()
    ds = scenes.ProceduralDataset("blocks", n_images=8, width=128,
                                  height=128, n_steps_gt=256)
    log(f"dataset in {time.time()-t0:.1f}s")
    t0 = time.time()
    entropy = driver.build_entropy(cfg_faith)
    # the fast config shares the (identical) static tables; only the traced
    # rate graphs differ through cfg.ctx_grad
    ent_fast = copy.copy(entropy)
    ent_fast.cfg = cfg_fast.entropy
    log(f"entropy tables in {time.time()-t0:.1f}s")

    tr_fast = Trainer(cfg_fast, ds, entropy=ent_fast)
    tr_faith = Trainer(cfg_faith, ds, entropy=entropy)
    # warm both concurrently: identical programs (render/occ/apply) dedupe
    # in-process; only the rate graphs compile twice
    import concurrent.futures as cf
    with cf.ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(tr_fast.warm_compile, log_fn=log)
        f2 = pool.submit(tr_faith.warm_compile, log_fn=log)
        f1.result()
        f2.result()

    batch = cfg_fast.train.target_sample_batch_size

    rec_fast = _measure(tr_fast, warmup=18, measure=16, batch=batch,
                        estimate=estimate, tag="fast")
    _RESULT["fast"] = rec_fast
    _RESULT["value"] = rec_fast["samples_per_s_nominal"]
    _RESULT["vs_baseline"] = round(
        rec_fast["samples_per_s_nominal"] / BASELINE_SAMPLES_PER_SEC, 4)

    rec_faith = _measure(tr_faith, warmup=6, measure=8, batch=batch,
                         estimate=estimate, tag="faithful")
    _RESULT["faithful"] = rec_faith
    done.set()
    _emit()


if __name__ == "__main__":
    main()
