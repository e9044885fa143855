"""Per-step timing/bucket trace at the bench config (TPU)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import dataclasses
import jax

from cnc_tpu.utils.jit_cache import ensure_compilation_cache
ensure_compilation_cache()
import jax.numpy as jnp

from cnc_tpu.config import CNCConfig, EntropyConfig, ModelConfig, \
    RenderConfig, TrainConfig
from cnc_tpu.data import scenes
from cnc_tpu.train import driver
from cnc_tpu.train.trainer import Trainer


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = CNCConfig(
        model=ModelConfig(n_features_per_level=4),
        entropy=EntropyConfig(n_features=4, sample_num=100000),
        render=RenderConfig(),
        train=dataclasses.replace(TrainConfig(), lmbda=2e-3,
                                  init_batch_size=16384),
    )
    ds = scenes.ProceduralDataset("blocks", n_images=8, width=128, height=128,
                                  n_steps_gt=256)
    entropy = driver.build_entropy(cfg)
    tr = Trainer(cfg, ds, entropy=entropy)

    t_prev = [time.time()]

    def stamped(msg):
        now = time.time()
        log(f"[+{now - t_prev[0]:6.2f}s] {msg}")
        t_prev[0] = now

    tr.fit(max_steps=40, log_every=1, log_fn=stamped)


if __name__ == "__main__":
    main()
