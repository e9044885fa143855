"""Interpret-mode correctness tests for the Pallas table-gradient scatter.

The production path (CNC_PALLAS_SCATTER=1 on TPU) runs the same kernels
compiled by Mosaic; these tests validate the kernel logic and the custom-vjp
wiring through the Pallas interpreter on CPU (reference semantics being
matched: gridencoder.cu:399-585 kernel_grid_backward).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cnc_tpu.ops import pallas_scatter, scatter_ops


def _np_scatter(idx, vals8, size):
    out = np.zeros((8, size), np.float32)
    for i, e in enumerate(idx):
        if 0 <= e < size:
            out[:, e] += vals8[:, i]
    return out


class TestScatterAddTable:
    def test_matches_numpy_with_blocking(self):
        rng = np.random.default_rng(0)
        n, size = 300, 96          # pads N to 2 blocks; 2 table blocks
        idx = rng.integers(-5, size + 5, n).astype(np.int32)  # incl. oob
        vals8 = rng.standard_normal((8, n)).astype(np.float32)
        got = pallas_scatter.scatter_add_table(
            jnp.asarray(idx), jnp.asarray(vals8), size, interpret=True,
            n_block=256, t_block=64)
        np.testing.assert_allclose(np.asarray(got),
                                   _np_scatter(idx, vals8, size),
                                   rtol=0, atol=1e-5)

    def test_single_block(self):
        rng = np.random.default_rng(1)
        n, size = 64, 32
        idx = rng.integers(0, size, n).astype(np.int32)
        vals8 = rng.standard_normal((8, n)).astype(np.float32)
        got = pallas_scatter.scatter_add_table(
            jnp.asarray(idx), jnp.asarray(vals8), size, interpret=True,
            n_block=64, t_block=32)
        np.testing.assert_allclose(np.asarray(got),
                                   _np_scatter(idx, vals8, size), atol=1e-5)


class TestGroupedTableGrad:
    def test_matches_xla_backward(self):
        """The Pallas d_table equals the XLA column-scatter d_table on the
        static-level layout (disjoint group spans, masked corners at global
        id 0 with weight 0)."""
        rng = np.random.default_rng(2)
        n, groups, c, f = 40, 3, 4, 4
        spans = ((0, 48), (48, 80), (128, 64))
        t_total = 192
        gidx2 = np.zeros((n, groups * c), np.int32)
        w2 = rng.random((n, groups * c)).astype(np.float32)
        for gi, (off, sz) in enumerate(spans):
            gidx2[:, gi * c:(gi + 1) * c] = rng.integers(
                off, off + sz, (n, c))
        # masked corners: global id 0, weight 0
        mask = rng.random((n, groups * c)) < 0.2
        gidx2[mask] = 0
        w2[mask] = 0.0
        g = rng.standard_normal((n, groups * f)).astype(np.float32)
        table = rng.standard_normal((t_total, f)).astype(np.float32)

        got = pallas_scatter.grouped_table_grad(
            jnp.asarray(g), jnp.asarray(gidx2), jnp.asarray(w2), groups, f,
            t_total, spans, interpret=True, n_block=64, t_block=64)

        # XLA reference: the column-scatter backward
        def fwd(tbl):
            return scatter_ops.grouped_gather_interp(
                tbl, jnp.asarray(gidx2), jnp.asarray(w2), groups, f, False)

        _, vjp = jax.vjp(fwd, jnp.asarray(table))
        want = vjp(jnp.asarray(g))[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_vjp_dispatch_through_flag(self, monkeypatch):
        """grouped_gather_interp's bwd routes through the Pallas kernel when
        the flag is on and produces the same gradient."""
        monkeypatch.setenv("CNC_PALLAS_SCATTER", "1")
        monkeypatch.setenv("CNC_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("CNC_PALLAS_NBLOCK", "64")
        monkeypatch.setenv("CNC_PALLAS_TBLOCK", "64")
        rng = np.random.default_rng(3)
        n, groups, c, f = 16, 2, 4, 4
        spans = ((0, 32), (32, 32))
        table = jnp.asarray(rng.standard_normal((64, f)).astype(np.float32))
        gidx2 = jnp.asarray(np.concatenate([
            rng.integers(0, 32, (n, c)), rng.integers(32, 64, (n, c))],
            axis=1).astype(np.int32))
        w2 = jnp.asarray(rng.random((n, 2 * c)).astype(np.float32))

        def loss(tbl, spans_arg):
            out = scatter_ops.grouped_gather_interp(
                tbl, gidx2, w2, groups, f, False, spans_arg)
            return jnp.sum(out * out)

        g_pallas = jax.grad(loss)(table, spans)
        monkeypatch.setenv("CNC_PALLAS_SCATTER", "0")
        g_xla = jax.grad(loss)(table, None)
        np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                                   rtol=1e-5, atol=1e-5)
