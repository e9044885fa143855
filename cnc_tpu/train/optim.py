"""Optimizers and LR schedules with reference-driver parity.

The reference uses two torch Adam optimizers (radiance field with additive L2
weight decay; entropy models without), both at lr 6e-3, eps 1e-15, under a
ChainedScheduler of LinearLR(start_factor 0.01, 1000 iters) and
MultiStepLR([9000,12000,15000,17000,19000], gamma 0.33)
(train_CNC_nerf_synthetic.py:254-294).  optax equivalents:

  * torch Adam(eps)         -> scale_by_adam(eps=eps, eps_root=0)
  * torch weight_decay      -> add_decayed_weights *before* scale_by_adam
    (torch adds wd*p to the gradient before moment updates)
  * chained schedulers      -> product of both factors per step
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax

from ..config import TrainConfig


def reference_schedule(cfg: TrainConfig):
    def sched(count):
        t = jnp.asarray(count, jnp.float32)
        warm = cfg.warmup_start_factor + (1.0 - cfg.warmup_start_factor) * \
            jnp.minimum(t / cfg.warmup_iters, 1.0)
        n_hit = jnp.zeros((), jnp.float32)
        for m in cfg.lr_milestones:
            n_hit = n_hit + (t >= m)
        return cfg.lr * warm * (cfg.lr_gamma ** n_hit)
    return sched


def make_optimizer(cfg: TrainConfig, weight_decay: float = 0.0,
                   decay_mask=None) -> optax.GradientTransformation:
    """Adam + schedule (+ optional additive L2 on a masked subtree)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay, mask=decay_mask))
    parts += [
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=cfg.adam_eps, eps_root=0.0),
        optax.scale_by_learning_rate(reference_schedule(cfg)),
    ]
    return optax.chain(*parts)
