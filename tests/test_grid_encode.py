"""Validate the JAX hash-grid encoder against the NumPy CUDA-semantics oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cnc_tpu.config import GridSpec
import cnc_tpu.ops.encoding as ge
import cnc_tpu.ops.sat as sat_ops

import oracle


def small_spec_3d():
    return GridSpec(num_dim=3, n_features=2, resolutions=(10, 18, 34),
                    log2_hashmap_size=9)


def small_spec_2d():
    return GridSpec(num_dim=2, n_features=2, resolutions=(18, 34, 66),
                    log2_hashmap_size=9)


def rand_table(spec, rng):
    return rng.standard_normal((spec.total_entries, spec.n_features)).astype(
        np.float32)


class TestEncodeForward:
    @pytest.mark.parametrize("specfn", [small_spec_3d, small_spec_2d])
    def test_matches_oracle(self, specfn):
        rng = np.random.default_rng(0)
        spec = specfn()
        table = rand_table(spec, rng)
        pts = rng.random((200, spec.num_dim)).astype(np.float32)
        got = np.asarray(ge.grid_encode(jnp.asarray(pts), jnp.asarray(table), spec))
        want = oracle.grid_encode_oracle(pts, table, spec.resolutions, spec.offsets)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_oob_zero(self):
        rng = np.random.default_rng(1)
        spec = small_spec_3d()
        table = rand_table(spec, rng)
        pts = np.array([[1.2, 0.5, 0.5], [-0.1, 0.2, 0.3]], dtype=np.float32)
        got = np.asarray(ge.grid_encode(jnp.asarray(pts), jnp.asarray(table), spec))
        np.testing.assert_array_equal(got, np.zeros_like(got))

    def test_level_range(self):
        rng = np.random.default_rng(2)
        spec = small_spec_3d()
        table = rand_table(spec, rng)
        pts = rng.random((50, 3)).astype(np.float32)
        full = np.asarray(ge.grid_encode(jnp.asarray(pts), jnp.asarray(table), spec))
        sub = np.asarray(ge.grid_encode(jnp.asarray(pts), jnp.asarray(table), spec,
                                        min_level=1, max_level=3))
        np.testing.assert_allclose(sub, full[:, spec.n_features:], rtol=1e-6)

    def test_with_occupancy_mask(self):
        rng = np.random.default_rng(3)
        spec = small_spec_3d()
        table = rand_table(spec, rng)
        rb = 16
        grid = rng.random((rb, rb, rb)) < 0.15
        pts = rng.random((100, 3)).astype(np.float32)
        got = np.asarray(ge.grid_encode(jnp.asarray(pts), jnp.asarray(table), spec,
                                        occ_binary=jnp.asarray(grid)))
        want = oracle.grid_encode_oracle(pts, table, spec.resolutions,
                                         spec.offsets, binary_vxl=grid)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_diff_levels_matches_static(self):
        rng = np.random.default_rng(4)
        spec = small_spec_3d()
        table = rand_table(spec, rng)
        pts = rng.random((60, 3)).astype(np.float32)
        # all points at min_level=1, 2 levels -> equals static [1,3)
        ids = jnp.ones((60,), jnp.int32)
        got = np.asarray(ge.grid_encode_diff_levels(
            jnp.asarray(pts), jnp.asarray(table), spec, ids, 2))
        want = np.asarray(ge.grid_encode(jnp.asarray(pts), jnp.asarray(table),
                                         spec, min_level=1, max_level=3))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    def test_diff_levels_mixed(self):
        rng = np.random.default_rng(5)
        spec = small_spec_3d()
        table = rand_table(spec, rng)
        pts = rng.random((40, 3)).astype(np.float32)
        ids = rng.integers(0, 2, size=40).astype(np.int32)
        got = np.asarray(ge.grid_encode_diff_levels(
            jnp.asarray(pts), jnp.asarray(table), spec, jnp.asarray(ids), 2))
        for lv in [0, 1]:
            m = ids == lv
            want = np.asarray(ge.grid_encode(jnp.asarray(pts[m]),
                                             jnp.asarray(table), spec,
                                             min_level=lv, max_level=lv + 2))
            np.testing.assert_allclose(got[m], want, rtol=2e-4, atol=1e-5)

    def test_given_table_dense_plane(self):
        rng = np.random.default_rng(6)
        res = 34
        plane = rng.standard_normal((res * res, 2)).astype(np.float32)
        pts = rng.random((50, 2)).astype(np.float32)
        got = np.asarray(ge.grid_encode_given_table(jnp.asarray(pts),
                                                    jnp.asarray(plane), res))
        want = oracle.grid_encode_oracle(pts, plane, [res], [0, res * res])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


class TestEncodeBackward:
    def test_scatter_add_gradient(self):
        """Backward = scatter-add of w*wn_re*grad (gridencoder.cu:399-585)."""
        rng = np.random.default_rng(7)
        spec = small_spec_3d()
        table = rand_table(spec, rng)
        pts = rng.random((30, 3)).astype(np.float32)
        cot = rng.standard_normal((30, spec.output_dim)).astype(np.float32)

        def f(tbl):
            return jnp.sum(ge.grid_encode(jnp.asarray(pts), tbl, spec) *
                           jnp.asarray(cot))

        g = np.asarray(jax.grad(f)(jnp.asarray(table)))

        # finite check against numerical directional derivative
        v = rng.standard_normal(table.shape).astype(np.float32)
        eps = 1e-3
        fp = float(f(jnp.asarray(table + eps * v)))
        fm = float(f(jnp.asarray(table - eps * v)))
        np.testing.assert_allclose((fp - fm) / (2 * eps), np.sum(g * v),
                                   rtol=2e-2, atol=1e-2)

    def test_gradient_zero_for_untouched_entries(self):
        rng = np.random.default_rng(8)
        spec = small_spec_3d()
        table = rand_table(spec, rng)
        pts = np.full((4, 3), 0.5, dtype=np.float32)

        def f(tbl):
            return jnp.sum(ge.grid_encode(jnp.asarray(pts), tbl, spec))

        g = np.asarray(jax.grad(f)(jnp.asarray(table)))
        touched = np.abs(g).sum(-1) > 0
        # only up to 8 corners per level can be touched
        assert touched.sum() <= 8 * spec.n_levels
        assert touched.sum() > 0
