"""Statistical validation of the data-parallel entropy estimate.

The multichip trainer gives each device a 1/n_dev sampling quota and pmean's
the extrapolated bits (parallel/sharding.py rate_body).  This test checks the
claim behind that design: the pmean of per-device window estimates is an
unbiased estimator of the same expectation the single-device estimator
targets — their means over many PRNG keys must agree.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cnc_tpu.config import EntropyConfig, GridSpec
from cnc_tpu.models import context_models as cm
from cnc_tpu.parallel.sharding import make_mesh


N_DEV = 8


def _setup(sample_num):
    ecfg = EntropyConfig(
        n_features=2, sample_num=sample_num, max_context_layer_num=2,
        Pg_level=4, Pg_level_2D=2, skip_levels_3d=(0, 1), skip_levels_2d=(0,),
        Rb=16, pn_coords_cap=1 << 14, pn_frac_sample_cap=None,
        # large caps: quota truncation would bias the comparison
        sample_num_2d=None, v_ctx_cap=1 << 16)
    spec3 = GridSpec(3, 2, (10, 18, 34, 66), 10)
    spec2 = GridSpec(2, 2, (18, 34), 8)
    return ecfg, spec3, spec2



@pytest.mark.slow
def test_sharded_rate_estimate_is_unbiased():
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(3)
    binaries = jnp.asarray(rng.random((16, 16, 16)) < 0.2)

    ecfg, spec3, spec2 = _setup(sample_num=64)
    ctx_full = cm.ContextModels(ecfg, spec3, spec2)
    ctx_dev = cm.ContextModels(
        dataclasses.replace(ecfg, sample_num=64 // N_DEV), spec3, spec2)

    ent_params = ctx_full.init_params(key)
    tables = {
        "xyz": jnp.asarray(np.sign(rng.standard_normal(
            (spec3.total_entries, 2))).astype(np.float32)),
        **{ax: jnp.asarray(np.sign(rng.standard_normal(
            (spec2.total_entries, 2))).astype(np.float32))
           for ax in ("xy", "xz", "yz")},
    }
    cache_full = ctx_full.refresh_cache(binaries)
    cache_dev = ctx_dev.refresh_cache(binaries)

    # single-device estimator: E over keys of the sampled-window bits
    @jax.jit
    def single(k, tbls):
        return ctx_full.rate_bits_3d(ent_params, tables["xyz"], k,
                                     cache_full, tbls)

    mesh = make_mesh(N_DEV)

    def body(k):
        k = jax.random.fold_in(k, jax.lax.axis_index("data"))
        bits = ctx_dev.rate_bits_3d(ent_params, tables["xyz"], k, cache_dev,
                                    ctx_dev.table_arrays)
        return jax.lax.pmean(bits, "data")

    sharded = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P(),
                                    out_specs=P(), check_vma=False))

    n_trials = 48
    keys = jax.random.split(jax.random.PRNGKey(7), n_trials)
    got_single = np.asarray([float(single(k, ctx_full.table_arrays))
                             for k in keys])
    got_shard = np.asarray([float(sharded(k)) for k in keys])

    m_s, m_p = got_single.mean(), got_shard.mean()
    # both estimate the same total-bits expectation; means must agree within
    # combined standard errors (3 sigma) and a 10% relative guard
    se = np.hypot(got_single.std() / np.sqrt(n_trials),
                  got_shard.std() / np.sqrt(n_trials))
    assert abs(m_s - m_p) < max(3.0 * se, 0.10 * abs(m_s)), (
        m_s, m_p, se)
