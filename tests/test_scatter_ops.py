"""Table scatter-add and fused gather/interp: parity with autodiff."""

import numpy as np
import jax
import jax.numpy as jnp

import cnc_tpu.ops.scatter_ops as so
import cnc_tpu.ops.encoding as enc_mod
from cnc_tpu.config import GridSpec


def test_scatter_add_sorted_matches_dense():
    rng = np.random.default_rng(0)
    n, t, f = 5000, 300, 4
    idx = rng.integers(0, t, n).astype(np.int32)
    vals = rng.standard_normal((n, f)).astype(np.float32)
    got = np.asarray(so.scatter_add_sorted(jnp.asarray(vals), jnp.asarray(idx), t))
    want = np.zeros((t, f), np.float32)
    np.add.at(want, idx, vals)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_level_gather_interp_grads_match_autodiff():
    rng = np.random.default_rng(1)
    n, t, c, f = 512, 200, 8, 4
    table = jnp.asarray(rng.standard_normal((t, f)).astype(np.float32))
    gidx = jnp.asarray(rng.integers(0, t, (n, c)).astype(np.int32))
    w = jnp.asarray(rng.random((n, c)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    def ref(table, w):
        feats = table[gidx]
        return jnp.einsum("nc,ncf->nf", w, feats)

    out1 = so.level_gather_interp(table, gidx, w)
    out2 = ref(table, w)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    g1 = jax.grad(lambda tb, ww: jnp.sum(so.level_gather_interp(tb, gidx, ww)
                                         * cot), argnums=(0, 1))(table, w)
    g2 = jax.grad(lambda tb, ww: jnp.sum(ref(tb, ww) * cot),
                  argnums=(0, 1))(table, w)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               atol=1e-4, rtol=1e-4)


def test_encode_backward_paths_agree():
    spec = GridSpec(num_dim=3, n_features=2, resolutions=(10, 18, 34),
                    log2_hashmap_size=9)
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.standard_normal(
        (spec.total_entries, 2)).astype(np.float32))
    pts = jnp.asarray(rng.random((300, 3)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((300, spec.output_dim)).astype(np.float32))

    def loss(tbl):
        return jnp.sum(enc_mod.grid_encode(pts, tbl, spec) * cot)

    enc_mod.USE_SORTED_BACKWARD = True
    g_sorted = np.asarray(jax.grad(loss)(table))
    enc_mod.USE_SORTED_BACKWARD = False
    try:
        g_plain = np.asarray(jax.grad(loss)(table))
    finally:
        enc_mod.USE_SORTED_BACKWARD = True
    np.testing.assert_allclose(g_sorted, g_plain, atol=2e-4, rtol=1e-3)


def test_compact_mask_indices():
    rng = np.random.default_rng(5)
    mask = jnp.asarray(rng.random(5000) < 0.3)
    want = np.flatnonzero(np.asarray(mask))
    for cap in (16, len(want), 4096):
        src, count = so.compact_mask_indices(mask, cap)
        assert int(count) == len(want)
        take = min(cap, len(want))
        np.testing.assert_array_equal(np.asarray(src)[:take], want[:take])


def test_compact_mask_indices_empty():
    src, count = so.compact_mask_indices(jnp.zeros(128, bool), 8)
    assert int(count) == 0
    np.testing.assert_array_equal(np.asarray(src), np.zeros(8, np.int32))
