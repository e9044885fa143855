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
"""

import json
import os
import subprocess
import sys
import time


def measure(n_dev: int) -> dict:
    import dataclasses

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    # sitecustomize binds the axon (single-TPU) platform at interpreter
    # start regardless of env; re-point at the virtual CPU mesh
    if len(jax.devices()) < n_dev or jax.devices()[0].platform != "cpu":
        import jax.extend.backend as jax_backend
        jax.config.update("jax_platforms", "cpu")
        jax_backend.clear_backends()
        assert len(jax.devices()) >= n_dev, jax.devices()
    import jax.numpy as jnp
    import numpy as np

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
    tr = Trainer(cfg, ds, entropy=entropy, mesh=mesh)
    tr.fit(max_steps=3, log_every=0)           # compile + warm
    t0 = time.time()
    tr.fit(max_steps=11, log_every=0)
    dt = (time.time() - t0) / 8
    return {"n_devices": n_dev, "step_ms": round(dt * 1e3, 1)}


def main():
    if os.environ.get("CNC_MESH_N"):
        n = int(os.environ["CNC_MESH_N"])
        print(json.dumps(measure(n)), flush=True)
        return
    counts = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1
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
