#!/usr/bin/env python
"""Data-parallel step-time scaling on a virtual CPU mesh (1..8 devices).

Times the full DP train step (sharded render grad + per-device entropy
windows + apply) at a FIXED global workload: the global ray batch, sample
budget, and total entropy quotas stay constant while the device count grows,
so ideal scaling halves the per-step wall clock per doubling (minus psum and
compile overheads).  CPU-mesh timing is a proxy — the per-device compute is
real, the interconnect is host shared memory — but it validates that the
sharded program partitions the work instead of replicating it.

Each device count runs in a subprocess (the XLA host-device-count flag must
be set before jax initializes).  Results append to stdout as one JSON line
per count; run with no args to sweep {1, 2, 4, 8}.

`mesh_scaling.py cost [counts]` reports per-device FLOPs of the compiled
step executables instead of timing — on a host with fewer cores than
virtual devices, wall-clock measures XLA's in-process collective rendezvous
spin-waits rather than scaling, while compiled per-device FLOPs are
timing-free evidence of partitioning (see cost()).
"""

import json
import os
import subprocess
import sys
import time


def measure(n_dev: int) -> dict:
    tr, cfg = _build(n_dev)
    tr.fit(max_steps=3, log_every=0)           # compile + warm
    t0 = time.time()
    tr.fit(max_steps=11, log_every=0)
    dt = (time.time() - t0) / 8
    return {"n_devices": n_dev, "step_ms": round(dt * 1e3, 1)}


def _build(n_dev):
    import dataclasses

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    # sitecustomize binds the axon (single-TPU) platform at interpreter
    # start regardless of env; re-point at the virtual CPU mesh BEFORE any
    # jax.devices() query — with the tunnel down, touching the axon backend
    # first either hangs in its claim loop or raises at init
    if jax.config.jax_platforms != "cpu":
        import jax.extend.backend as jax_backend
        jax.config.update("jax_platforms", "cpu")
        jax_backend.clear_backends()
    assert len(jax.devices()) >= n_dev, jax.devices()

    from cnc_tpu.config import (CNCConfig, EntropyConfig, ModelConfig,
                                RenderConfig, TrainConfig)
    from cnc_tpu.data import scenes
    from cnc_tpu.train import driver
    from cnc_tpu.train.trainer import Trainer
    from cnc_tpu.parallel.sharding import make_mesh

    cfg = CNCConfig(
        model=ModelConfig(n_features_per_level=2, n_neurons=64,
                          resolutions_3d=(10, 18, 34, 66, 130),
                          resolutions_2d=(18, 34, 66),
                          log2_hashmap_size=14, log2_hashmap_size_2D=10,
                          pe_num_freqs=6),
        entropy=EntropyConfig(n_features=2, sample_num=8192,
                              max_context_layer_num=2, Pg_level=5,
                              Pg_level_2D=3, skip_levels_3d=(0, 1),
                              skip_levels_2d=(0,), Rb=16,
                              pn_coords_cap=1 << 16,
                              pn_frac_sample_cap=None, sample_num_2d=2048,
                              v_ctx_cap=1 << 14),
        render=dataclasses.replace(RenderConfig(), occ_resolution=16,
                                   render_step_size=0.02,
                                   sample_budget=1 << 14, march_block=16,
                                   occ_warmup_steps=0),
        train=dataclasses.replace(TrainConfig(), lmbda=2e-3,
                                  init_batch_size=4096, min_ray_bucket=4096,
                                  max_ray_bucket=4096,
                                  target_sample_batch_size=0))
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    ds = scenes.ProceduralDataset("blocks", n_images=4, width=64, height=64,
                                  n_steps_gt=64)
    entropy = driver.build_entropy(cfg, n_dev)
    return Trainer(cfg, ds, entropy=entropy, mesh=mesh), cfg


def cost(n_dev: int) -> dict:
    """Per-device FLOPs of the compiled step programs (AOT cost analysis).

    On a single-core host, wall-clock over a virtual mesh measures XLA's
    in-process collective rendezvous spin-waits, not scaling.  Per-device
    FLOPs from the compiled executable are timing-free evidence that the
    sharded programs PARTITION the work (ideal: flops(n) = flops(1)/n plus
    collective overhead) instead of replicating it."""
    tr, cfg = _build(n_dev)
    import jax
    import jax.numpy as jnp

    bucket = 4096
    tr.key, k = jax.random.split(tr.key)
    rays, pixels = tr._fetch(bucket, k)
    bkgd = jnp.ones((3,))
    ent_cache = tr.entropy.init_cache()

    def flops(fn, *args):
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", -1.0))

    out = {"n_devices": n_dev}
    out["render_grad_gflops_per_dev"] = round(flops(
        tr._render_grad_fn(bucket), tr.params, tr.occ_state.binaries,
        rays.origins, rays.viewdirs, pixels, bkgd, k) / 1e9, 3)
    out["rate3d_gflops_per_dev"] = round(flops(
        tr._rate3d_grad_fn(), tr.params, tr.ent_params, tr._rate_scale(), k,
        ent_cache, tr.entropy.table_arrays) / 1e9, 3)
    out["rate2d_gflops_per_dev"] = round(flops(
        tr._rate2d_grad_fn(), tr.params, tr.ent_params, tr._rate_scale(), k,
        ent_cache, tr.entropy.table_arrays) / 1e9, 3)
    return out


def main():
    if os.environ.get("CNC_MESH_N"):
        n = int(os.environ["CNC_MESH_N"])
        fn = cost if os.environ.get("CNC_MESH_COST") else measure
        print(json.dumps(fn(n)), flush=True)
        return
    argv = sys.argv[1:]
    if argv and argv[0] == "cost":
        os.environ["CNC_MESH_COST"] = "1"
        argv = argv[1:]
    counts = [int(x) for x in (argv[0].split(",") if argv
                               else ("1", "2", "4", "8"))]
    for n in counts:
        env = dict(os.environ)
        env["CNC_MESH_N"] = str(n)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count={n}"
                            ).strip()
        # XLA's in-process collective rendezvous aborts after a hardcoded
        # 40 s if a participant thread is starved — on this 1-core host a
        # concurrent heavy process can kill the child, so don't let one
        # failure abort the sweep
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env)
        if r.returncode != 0:
            print(json.dumps({"n_devices": n, "error": r.returncode}),
                  flush=True)


if __name__ == "__main__":
    main()
