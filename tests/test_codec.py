"""Codec integration: lossless encode->decode roundtrip (the reference's own
acceptance criterion — train/encode/decode/re-eval PSNR equality,
train_CNC_nerf_synthetic.py:442-506 — reduced to table equality here)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cnc_tpu.codec import codec as codec_mod
from cnc_tpu.models import context_models as cm
from cnc_tpu.ops import ste as ste_ops

from test_context_models import tiny_setup


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    ecfg, spec3, spec2 = tiny_setup()
    ctx = cm.ContextModels(ecfg, spec3, spec2)
    rng = np.random.default_rng(42)
    key = jax.random.PRNGKey(1)
    ent_params = ctx.init_params(key)
    # trained-ish tables: biased signs so rates differ across entries
    tables = {}
    for name, spec in (("xyz", spec3), ("xy", spec2), ("xz", spec2),
                       ("yz", spec2)):
        raw = rng.standard_normal((spec.total_entries, 2)).astype(np.float32)
        raw += 0.5  # bias toward +1
        tables[name] = ste_ops.ste_binary(jnp.asarray(raw))
    binaries = jnp.asarray(rng.random((16, 16, 16)) < 0.2)
    out = tmp_path_factory.mktemp("streams")
    return ctx, ent_params, tables, binaries, str(out)


def test_roundtrip_lossless(setup):
    ctx, ent_params, tables, binaries, out_dir = setup
    cd = codec_mod.CNCCodec(ctx)
    pgs, est_mb, actual_mb = cd.encode(ent_params, tables, binaries, out_dir)
    assert actual_mb > 0
    # analytic estimate and actual coded size agree (SURVEY §4 cross-check).
    # With untrained context models many probabilities sit at the clamp, where
    # the coder's 16-bit quantization caps the cost below the analytic
    # -log2(1e-6); measured 18.75% on this fixture (2026-08-17).  Trained
    # models agree far tighter — the pipeline test enforces 15% and the
    # flagship hardware run measured 1.5% (RESULTS.md).
    assert abs(est_mb - actual_mb) / actual_mb < 0.22, (est_mb, actual_mb)

    rec = cd.decode(ent_params, binaries, pgs, out_dir)

    from cnc_tpu.codec import intctx

    cache = ctx.refresh_cache_int(binaries)
    ip = cd._int_params(ent_params)
    sign3 = intctx.sign_table(tables["xyz"])
    # 3D: skip levels must match exactly; context levels match on covered
    # entries and are +1 elsewhere
    tbl3 = np.asarray(tables["xyz"])
    rec3 = np.asarray(rec["xyz"])
    for l in range(ctx.spec3.n_levels):
        off, size = ctx.spec3.offsets[l], ctx.spec3.level_sizes[l]
        if l in ctx.cfg.skip_levels_3d or l >= ctx.pg_level:
            np.testing.assert_array_equal(rec3[off:off + size],
                                          tbl3[off:off + size])
        else:
            t = ctx.tables3d[l]
            chunk_e, n_chunks, _ = cd.chunks3d[l]
            for c in range(n_chunks):
                lo = c * chunk_e
                hi = min((c + 1) * chunk_e, t.n_entries)
                start = min(lo, t.n_entries - chunk_e)
                _, covered, _ = cd._pool3d_fn(l)(
                    ip, sign3, cache,
                    pg_q=jnp.int32(intctx.quantize_pg(pgs[f"3D{l}"])),
                    start_e=jnp.int32(start))
                cov = np.asarray(covered)[lo - start:hi - start]
                evals = ctx.entry_values_np("3d", l)[lo:hi]
                got = rec3[off + evals]
                want = tbl3[off + evals]
                np.testing.assert_array_equal(got[cov], want[cov])
                assert np.all(got[~cov] == 1.0)

    # 2D planes
    for ax in ("xy", "xz", "yz"):
        tbl2 = np.asarray(tables[ax])
        rec2 = np.asarray(rec[ax])
        for l in range(ctx.spec2.n_levels):
            off, size = ctx.spec2.offsets[l], ctx.spec2.level_sizes[l]
            if l in ctx.cfg.skip_levels_2d or l >= ctx.pg_level_2d:
                np.testing.assert_array_equal(rec2[off:off + size],
                                              tbl2[off:off + size])


def test_decode_needs_matching_occupancy(setup):
    """Context depends on the occupancy prior: decoding with a different
    binary grid desyncs the range coder — and the checksum recorded at
    encode time must catch it LOUDLY (ADVICE r2: a silent desync can
    corrupt decoded tables arbitrarily)."""
    ctx, ent_params, tables, binaries, out_dir = setup
    cd = codec_mod.CNCCodec(ctx)
    pgs, _, _ = cd.encode(ent_params, tables, binaries, out_dir)
    wrong = jnp.zeros_like(binaries).at[0, 0, 0].set(True)
    with pytest.raises(ValueError, match="codec desync"):
        cd.decode(ent_params, wrong, pgs, out_dir)


def test_bundle_roundtrip(setup, tmp_path):
    ctx, ent_params, tables, binaries, out_dir = setup
    pgs = {"3D0": 0.5, "xy1": 0.25}
    mlp = {"l0": {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}}
    codec_mod.save_bundle(str(tmp_path), pgs, ent_params, mlp, binaries,
                          {"scene": "test"})
    pgs2, ent2, mlp2, bin2 = codec_mod.load_bundle(str(tmp_path))
    assert pgs2 == {k: float(np.float32(v)) for k, v in pgs.items()}
    np.testing.assert_array_equal(np.asarray(binaries), bin2)
    assert len(ent2) == len(jax.tree.leaves(ent_params))


def test_quantize_mlp():
    params = {"w": jnp.asarray(np.linspace(-1, 1, 1000).reshape(10, 100))}
    mb, mb_orig, q = codec_mod.quantize_mlp_params(params, digits=13)
    err = np.abs(np.asarray(q["w"]) - np.asarray(params["w"])).max()
    assert err < 2.0 / (2 ** 13 - 1) + 1e-5
    assert mb < mb_orig


def test_2d_gather_mask_implies_coverage(setup):
    """Every coord the context gathers would treat as valid (footprint mask
    true) must belong to a CODED entry — otherwise decode reads a +1 default
    where encode read the trained sign and the range coder desyncs.  The 3D
    path holds this by sharing mask3d between gathers and pooling; this
    pins the 2D path to the same invariant (round-3 fix: pooling coverage
    had used block occupancy, a subset of the footprint mask)."""
    from cnc_tpu.codec import intctx
    from cnc_tpu.ops import hash_ops

    ctx, ent_params, tables, binaries, out_dir = setup
    cd = codec_mod.CNCCodec(ctx)
    cache = ctx.refresh_cache_int(binaries)
    ip = cd._int_params(ent_params)
    sign2 = intctx.sign_table(tables["xy"])
    sign3 = intctx.sign_table(tables["xyz"])
    plane_q = cd._frac_fn()(sign3, cache["pn"]["xy"])
    mask2d = np.asarray(cache["mask2d"])
    for l in ctx.ctx_levels_2d:
        t = ctx.tables2d[l]
        r = t.resolution
        _, covered, _ = cd._pool2d_fn(l)(
            ip, sign2, pg_q=jnp.int32(128), plane_q=plane_q,
            mask2d_ax=cache["mask2d"][0], start_e=jnp.int32(0),
            tbls=ctx.table_arrays)
        covered = np.asarray(covered)
        # entry index per covered-table slot
        evals = ctx.entry_values_np("2d", l)
        covered_by_entry = np.zeros(ctx.spec2.level_sizes[l], bool)
        covered_by_entry[evals] = covered
        off = ctx.mask2d_offsets[l]
        m = mask2d[0][off:off + r * r].reshape(r, r)  # [x, y] (x-major flat)
        xs, ys = np.nonzero(m)
        idx = hash_ops.grid_index_np(np.stack([xs, ys], -1), r,
                                     ctx.spec2.level_sizes[l])
        assert covered_by_entry[idx].all(), f"level {l}"


def test_device_pq_matches_host_pq():
    """device_pq (chunked uint32 long division) must be bit-identical to
    host_pq (one int64 division) over the full operand range the codec can
    produce: msum in +-2**30, wsum*m_scale < 2**27, including zero and
    negative pooled sums and saturating (p >= 1) cases."""
    from cnc_tpu.codec import intctx

    rng = np.random.default_rng(7)
    n = 1 << 15
    for m_scale in (1, 37, 2048):
        wmax = (1 << 27) // m_scale  # per-level shift budget: den < 2**27
        msum = rng.integers(-(1 << 30), 1 << 30, (n, 2), dtype=np.int32)
        wsum = rng.integers(0, wmax, (n,), dtype=np.int32)
        # force edge rows: zero/negative msum, zero wsum, exact saturation
        msum[0] = 0
        msum[1] = -1
        wsum[2] = 0
        msum[3] = (int(wsum[3]) * m_scale)       # p == 1 exactly
        msum[4] = (int(wsum[4]) * m_scale) - 1   # just below saturation
        want = intctx.host_pq(msum, wsum, m_scale)
        got = np.asarray(jax.jit(
            lambda m, w: intctx.device_pq(m, w, m_scale))(
                jnp.asarray(msum), jnp.asarray(wsum)))
        assert got.dtype == np.uint16
        np.testing.assert_array_equal(got, want)


def test_chunked_tail_window_coverage(tmp_path):
    """Round-3 desync regression: the LAST chunk of the LAST 3D context
    level slices a max-window of w vertices whose start can lie within w of
    the concatenated buffer's end; XLA clamps the dynamic_slice start
    BACKWARD, which (before the _window_slices fix) silently shifted the
    window so the tail entries' vertices fell past the validity mask and
    the entries pooled as "uncovered" — decode then left them at +1 while
    the pn prior read their trained sign, desyncing every downstream 2D
    stream (reference counterpart: encode_binary_vxl chunking,
    utils_bpp_acc.py:798-858, which keeps ragged chunks instead).

    Forces multi-chunk coding with a small max_points_per_chunk and asserts
    from first principles that EVERY entry with at least one footprint-valid
    vertex is reconstructed to its trained sign, and that the pn fraction
    planes computed from the decoded table are bit-identical to the
    encoder's."""
    import dataclasses

    from cnc_tpu.codec import intctx

    ecfg, spec3, spec2 = tiny_setup()
    ecfg = dataclasses.replace(ecfg, max_points_per_chunk=1 << 13)
    ctx = cm.ContextModels(ecfg, spec3, spec2)
    cd = codec_mod.CNCCodec(ctx)
    for l, (_, n_chunks, _) in cd.chunks3d.items():
        if l == ctx.ctx_levels_3d[-1]:
            assert n_chunks > 1, "config must force chunking on the last level"

    rng = np.random.default_rng(3)
    ent_params = ctx.init_params(jax.random.PRNGKey(5))
    tables = {}
    for name, spec in (("xyz", spec3), ("xy", spec2), ("xz", spec2),
                       ("yz", spec2)):
        raw = rng.standard_normal((spec.total_entries, 2)).astype(np.float32)
        raw -= 0.3  # bias toward -1 so un-coded +1 defaults are visible
        tables[name] = ste_ops.ste_binary(jnp.asarray(raw))
    binaries = jnp.asarray(rng.random((16, 16, 16)) < 0.2)
    out_dir = str(tmp_path)

    pgs, _, _ = cd.encode(ent_params, tables, binaries, out_dir)
    rec = cd.decode(ent_params, binaries, pgs, out_dir)  # raises on desync

    cache = ctx.refresh_cache_int(binaries)
    mask3d = np.asarray(cache["mask3d"])
    sign3 = np.asarray(intctx.sign_table(tables["xyz"]))
    rec3 = np.asarray(rec["xyz"].astype(jnp.int32))
    for l in ctx.ctx_levels_3d:
        t = ctx.tables3d[l]
        arrs = ctx.level_arrays_np("3d", l)
        valid_v = mask3d[ctx.mask3d_offsets[l] + arrs["pos_flat"]]
        # entry covered iff >=1 footprint-valid vertex in its cum window
        cum = arrs["cum"].astype(np.int64)
        starts = np.minimum(cum[:-1], valid_v.size - 1)
        has_valid = np.add.reduceat(valid_v.astype(np.int64),
                                    starts)[:t.n_entries] > 0
        has_valid &= (cum[1:] > cum[:-1])[:t.n_entries]
        slots = arrs["entry_values"][:t.n_entries][has_valid]
        np.testing.assert_array_equal(
            rec3[t.offset + slots], sign3[t.offset + slots],
            err_msg=f"3D level {l}: covered entry not reconstructed")
    # the desync channel itself: pn planes from decoded vs trained tables
    frac = cd._frac_fn()
    for ax in codec_mod.AXES:
        np.testing.assert_array_equal(
            np.asarray(frac(jnp.asarray(rec3), cache["pn"][ax])),
            np.asarray(frac(jnp.asarray(sign3), cache["pn"][ax])),
            err_msg=f"pn fraction plane {ax} differs after decode")


def test_refresh_rejects_mismatched_occupancy():
    """EntropyConfig.Rb must equal the occupancy grid resolution; a mismatch
    silently produced garbage pn dilation before the loud check."""
    ctx = cm.ContextModels(*tiny_setup())
    with pytest.raises(ValueError, match="occ_resolution"):
        ctx.refresh_cache_int(jnp.zeros((32, 32, 32), bool))
