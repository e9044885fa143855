"""Multi-chip data-parallel training step on the virtual 8-device CPU mesh.

The reference is single-GPU only (SURVEY.md §2.7); this covers the TPU-native
extension in cnc_tpu/parallel/sharding.py — shard_map ray parallelism with
psum loss reduction and gradient transpose over replicated tables — plus the
driver validation hook contract (one full RD step must compile AND execute).
"""

import jax
import numpy as np
import pytest

from cnc_tpu.parallel import sharding


def test_dryrun_multichip_full_rd_step():
    assert len(jax.devices()) >= 8
    # executes one full data-parallel train step (render + entropy rate +
    # optimizer) and asserts finite outputs internally
    sharding.dryrun_multichip(8)


def test_shard_rays_roundtrip():
    mesh = sharding.make_mesh(8)
    x = np.arange(8 * 4 * 3, dtype=np.float32).reshape(8 * 4, 3)
    (xs,) = sharding.shard_rays(mesh, x)
    assert xs.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
        xs.ndim)
    np.testing.assert_array_equal(np.asarray(xs), x)
