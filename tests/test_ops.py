"""Unit tests for foundational ops: hashing, STE, SH, SAT queries, scans."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cnc_tpu.config import GridSpec, default_grid_3d, default_grid_2d
from cnc_tpu.ops import (hash_ops, sat as sat_ops, scan as scan_ops,
                         ste as ste_ops, sh as sh_ops, entropy as ent_ops)

import oracle


class TestHash:
    def test_matches_oracle_hashed(self):
        rng = np.random.default_rng(0)
        pos = rng.integers(0, 514, size=(1000, 3))
        hs = 2 ** 19
        got = np.asarray(hash_ops.grid_index(jnp.asarray(pos), 514, hs))
        want = np.array([oracle.grid_index_oracle(p, 514, hs) for p in pos])
        np.testing.assert_array_equal(got, want)

    def test_matches_oracle_dense(self):
        rng = np.random.default_rng(1)
        pos = rng.integers(0, 24, size=(500, 3))
        hs = int(np.ceil(24 ** 3 / 8) * 8)
        got = np.asarray(hash_ops.grid_index(jnp.asarray(pos), 24, hs))
        want = np.array([oracle.grid_index_oracle(p, 24, hs) for p in pos])
        np.testing.assert_array_equal(got, want)

    def test_np_equals_jax(self):
        rng = np.random.default_rng(2)
        for r, hs in [(514, 2 ** 19), (1026, 2 ** 17), (33, 35940), (130, 2 ** 17)]:
            d = 3 if r in (514, 33) else 2
            pos = rng.integers(0, r, size=(300, d))
            a = hash_ops.grid_index_np(pos, r, hs)
            b = np.asarray(hash_ops.grid_index(jnp.asarray(pos), r, hs))
            np.testing.assert_array_equal(a, b)

    def test_per_point_resolution(self):
        rng = np.random.default_rng(3)
        spec = default_grid_3d()
        levels = rng.integers(0, spec.n_levels, size=200)
        res = np.array(spec.resolutions)[levels]
        hs = np.array([spec.level_sizes[l] for l in levels])
        pos = (rng.integers(0, 1 << 30, size=(200, 3)) % res[:, None])
        got = np.asarray(hash_ops.grid_index(jnp.asarray(pos), jnp.asarray(res),
                                             jnp.asarray(hs)))
        want = np.array([oracle.grid_index_oracle(pos[i], int(res[i]), int(hs[i]))
                         for i in range(200)])
        np.testing.assert_array_equal(got, want)


class TestGridSpec:
    def test_reference_3d_layout(self):
        spec = default_grid_3d(n_features=4)
        # resolutions get the +2 border
        assert spec.resolutions[0] == 18 and spec.resolutions[-1] == 514
        # dense until R^3 > 2^19: 78+2=80 -> 512000 dense; 106+2=108 -> hashed
        assert spec.is_dense(5) and not spec.is_dense(6)
        sizes = spec.level_sizes
        assert sizes[-1] == 2 ** 19
        assert sizes[0] == int(np.ceil(18 ** 3 / 8) * 8)

    def test_reference_2d_layout(self):
        spec = default_grid_2d(n_features=4)
        assert spec.resolutions == (130, 258, 514, 1026)
        assert spec.level_sizes[0] == int(np.ceil(130 ** 2 / 8) * 8)
        assert spec.level_sizes[-1] == 2 ** 17


class TestSTE:
    def test_binary_forward(self):
        x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
        np.testing.assert_array_equal(np.asarray(ste_ops.ste_binary(x)),
                                      [-1, -1, 1, 1, 1])

    def test_binary_grad_mask(self):
        g = jax.grad(lambda x: jnp.sum(ste_ops.ste_binary(x) * jnp.arange(1.0, 6.0)))(
            jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0]))
        np.testing.assert_array_equal(np.asarray(g), [0, 2, 3, 4, 0])

    def test_multistep(self):
        x = jnp.array([0.123, -0.456])
        y = ste_ops.ste_multistep(x, 10.0)
        np.testing.assert_allclose(np.asarray(y), [0.1, -0.5], atol=1e-7)
        g = jax.grad(lambda x: jnp.sum(ste_ops.ste_multistep(x, 10.0)))(x)
        np.testing.assert_array_equal(np.asarray(g), [1, 1])

    def test_trunc_exp_grad_clamp(self):
        g = jax.grad(lambda x: jnp.sum(ste_ops.trunc_exp(x)))(jnp.array([20.0, 1.0]))
        np.testing.assert_allclose(np.asarray(g), [np.exp(15.0), np.exp(1.0)],
                                   rtol=1e-5)


class TestSH:
    def test_constant_band(self):
        d = jnp.array([[0.3, 0.8, 0.1]])
        out = sh_ops.sh_encode(d, degree=4)
        assert out.shape == (1, 16)
        np.testing.assert_allclose(out[0, 0], 0.28209479, rtol=1e-6)

    def test_linear_band_signs(self):
        # +z direction in [0,1] convention: (0.5, 0.5, 1.0)
        out = np.asarray(sh_ops.sh_encode(jnp.array([[0.5, 0.5, 1.0]]), 4))[0]
        np.testing.assert_allclose(out[2], 0.4886025, rtol=1e-5)  # z term
        np.testing.assert_allclose(out[1], 0.0, atol=1e-6)
        np.testing.assert_allclose(out[3], 0.0, atol=1e-6)

    def test_sine_embed_dim_and_order(self):
        x = jnp.array([[0.1, 0.2, 0.3]])
        out = sh_ops.sine_embed(x, 10)
        assert out.shape == (1, 63)
        np.testing.assert_allclose(np.asarray(out[0, :3]), [0.1, 0.2, 0.3],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out[0, 3:6]),
                                   np.sin([0.1, 0.2, 0.3]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out[0, 6:9]),
                                   np.cos([0.1, 0.2, 0.3]), rtol=1e-6)


class TestSAT:
    def test_box_count_3d(self):
        rng = np.random.default_rng(4)
        grid = rng.random((16, 16, 16)) < 0.3
        sat = sat_ops.build_sat(jnp.asarray(grid))
        lo = rng.integers(0, 16, size=(50, 3))
        hi = np.minimum(lo + rng.integers(0, 8, size=(50, 3)), 15)
        got = np.asarray(sat_ops.box_count(sat, jnp.asarray(lo), jnp.asarray(hi)))
        for i in range(50):
            want = grid[lo[i, 0]:hi[i, 0] + 1, lo[i, 1]:hi[i, 1] + 1,
                        lo[i, 2]:hi[i, 2] + 1].sum()
            assert got[i] == want

    def test_corner_mask_matches_cuda_walk(self):
        rng = np.random.default_rng(5)
        rb = 32
        grid = rng.random((rb, rb, rb)) < 0.1
        sat = sat_ops.build_sat(jnp.asarray(grid))
        for r in [18, 44, 108, 514]:
            corners = rng.integers(0, r, size=(100, 3))
            got = np.asarray(sat_ops.occupancy_mask(sat, jnp.asarray(corners), r, rb))
            want = np.array([oracle.corner_mask_oracle(c, r, grid) for c in corners])
            np.testing.assert_array_equal(got, want)

    def test_overlap_matches_cuda_walk(self):
        rng = np.random.default_rng(6)
        rb = 32
        grid = rng.random((rb, rb, rb)) < 0.2
        sat = sat_ops.build_sat(jnp.asarray(grid))
        for r in [44, 108, 514]:
            corners = rng.integers(1, r - 1, size=(60, 3))
            got = np.asarray(sat_ops.overlap_volume_cells(
                sat, jnp.asarray(corners), r, rb))
            want = np.array([oracle.overlap_oracle(c, r, grid) for c in corners])
            np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

    def test_overlap_2d(self):
        rng = np.random.default_rng(7)
        rb = 32
        grid = rng.random((rb, rb)) < 0.25
        sat = sat_ops.build_sat(jnp.asarray(grid))
        corners = rng.integers(1, 129, size=(60, 2))
        got = np.asarray(sat_ops.overlap_volume_cells(sat, jnp.asarray(corners),
                                                      130, rb))
        want = np.array([oracle.overlap_oracle(c, 130, grid) for c in corners])
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


class TestScan:
    def test_exclusive_sum_docstring(self):
        x = jnp.array([1.0, 2.0, 3.0, 4.0])
        ids = jnp.array([0, 0, 1, 1])
        np.testing.assert_allclose(
            np.asarray(scan_ops.segment_exclusive_sum(x, ids)), [0, 1, 0, 3])

    def test_inclusive_prod(self):
        x = jnp.array([2.0, 3.0, 4.0, 5.0])
        ids = jnp.array([0, 0, 0, 2])
        np.testing.assert_allclose(
            np.asarray(scan_ops.segment_inclusive_prod(x, ids)), [2, 6, 24, 5])

    def test_exclusive_prod(self):
        x = jnp.array([2.0, 3.0, 4.0, 5.0])
        ids = jnp.array([0, 0, 1, 1])
        np.testing.assert_allclose(
            np.asarray(scan_ops.segment_exclusive_prod(x, ids)), [1, 2, 1, 4])

    def test_random_against_numpy(self):
        rng = np.random.default_rng(8)
        x = rng.standard_normal(1000).astype(np.float32)
        # contiguous random segments
        n_seg = 37
        cuts = np.sort(rng.choice(np.arange(1, 1000), n_seg - 1, replace=False))
        ids = np.zeros(1000, dtype=np.int32)
        ids[cuts] = 1
        ids = np.cumsum(ids)
        got = np.asarray(scan_ops.segment_exclusive_sum(jnp.asarray(x),
                                                        jnp.asarray(ids)))
        want = np.zeros_like(x)
        for s in range(n_seg):
            m = ids == s
            want[m] = np.cumsum(x[m]) - x[m]
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_grad_flows(self):
        x = jnp.arange(1.0, 9.0)
        ids = jnp.array([0, 0, 0, 1, 1, 2, 2, 2])
        g = jax.grad(lambda x: jnp.sum(
            scan_ops.segment_inclusive_sum(x, ids) ** 2))(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestEntropy:
    def test_bernoulli_bits(self):
        x = jnp.array([1.0, -1.0])
        p = jnp.array([0.9, 0.9])
        bits = np.asarray(ent_ops.bernoulli_bits(x, p))
        np.testing.assert_allclose(bits, [-np.log2(0.9), -np.log2(0.1)],
                                   rtol=1e-5)

    def test_global_pg(self):
        x = jnp.array([1.0, 1.0, 1.0, -1.0])
        pg, bits, n = ent_ops.global_pg_bits(x)
        assert n == 4
        np.testing.assert_allclose(float(pg), 0.75)
        np.testing.assert_allclose(float(bits),
                                   3 * -np.log2(0.75) + 1 * -np.log2(0.25),
                                   rtol=1e-6)
