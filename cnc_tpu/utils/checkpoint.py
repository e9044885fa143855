"""Checkpoint / resume.

The reference has none (no torch.save anywhere — SURVEY.md §5); this is a
first-class addition: the full training state (radiance-field params, entropy
params, both optimizer states, occupancy grid, step counter, PRNG key) round-
trips through a single npz, so a 20k-step run survives preemption.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix: str) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {f"{prefix}|{jax.tree_util.keystr(path)}": np.asarray(leaf)
            for path, leaf in flat}


def _unflatten_into(tree, data: Dict[str, np.ndarray], prefix: str):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for path, leaf in flat:
        key = f"{prefix}|{jax.tree_util.keystr(path)}"
        arr = data[key]
        leaves.append(jnp.asarray(arr).astype(leaf.dtype).reshape(leaf.shape))
    return jax.tree_util.tree_unflatten(treedef, [l for l in leaves])


def norm_path(path: str) -> str:
    """np.savez appends '.npz' to extension-less paths; normalize once so
    save and the resume existence check agree on the same file."""
    return path if path.endswith(".npz") else path + ".npz"


def save_checkpoint(path: str, trainer) -> None:
    """Serialize a train.trainer.Trainer's full state."""
    path = norm_path(path)
    payload = {}
    payload.update(_flatten(trainer.params, "params"))
    payload.update(_flatten(trainer.ent_params, "ent"))
    payload.update(_flatten(trainer.opt_state_rf, "opt_rf"))
    if trainer.opt_state_ent is not None:
        payload.update(_flatten(trainer.opt_state_ent, "opt_ent"))
    payload["occs"] = np.asarray(trainer.occ_state.occs)
    payload["binaries"] = np.packbits(
        np.asarray(trainer.occ_state.binaries).reshape(-1))
    payload["bin_res"] = np.asarray(trainer.occ_state.resolution)
    payload["step"] = np.asarray(trainer.step)
    payload["num_rays"] = np.asarray(trainer.num_rays)
    payload["key"] = np.asarray(trainer.key)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # write-then-rename: a watchdog kill mid-savez must never leave a torn
    # file at the resume path (the overnight orchestrators SIGKILL stalled
    # runs; np.savez of a flagship state takes seconds)
    tmp = path + ".tmp.npz"   # keep the .npz suffix so savez won't rename
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, trainer) -> None:
    """Restore state in place (trainer must be built with the same config)."""
    data = dict(np.load(norm_path(path), allow_pickle=False))
    trainer.params = _unflatten_into(trainer.params, data, "params")
    trainer.ent_params = _unflatten_into(trainer.ent_params, data, "ent")
    trainer.opt_state_rf = _unflatten_into(trainer.opt_state_rf, data,
                                           "opt_rf")
    if trainer.opt_state_ent is not None:
        trainer.opt_state_ent = _unflatten_into(trainer.opt_state_ent, data,
                                                "opt_ent")
    res = int(data["bin_res"])
    n = res ** 3
    binaries = np.unpackbits(data["binaries"])[:n].reshape((res,) * 3)
    trainer.occ_state = trainer.occ_state._replace(
        occs=jnp.asarray(data["occs"]),
        binaries=jnp.asarray(binaries.astype(bool)))
    trainer.step = int(data["step"])
    trainer.num_rays = int(data["num_rays"])
    trainer.key = jnp.asarray(data["key"])
