"""CNC bitstream codec: full-coverage encode and sequential decode.

Mirrors the reference encode/decode drivers (utils_bpp_acc.py:709-999):

  encode: per level, compute per-entry Bernoulli probabilities from the
  context models (full coverage, chunked by a vertex budget), pull to host,
  range-code the +-1 entries, write `{prefix}_{3D|xy|xz|yz}{level}[_{chunk}].b`
  files — same stream naming as the reference (:77-93, :722-854).

  decode: strictly level-sequential — 3D levels 0..L in order (context reads
  only already-decoded coarser levels), then the three planes (whose
  dimension-wise prior needs the fully decoded finest 3D level, :986-996).
  Entries never touched by an occupied block/footprint are not coded and
  keep their +1 initialization (decode writes only covered entries, :978).

Unlike the reference (which keeps Pg scalars and model weights in process
memory, :865), the bundle here is self-contained: save_bundle serializes the
Pg dictionary, context-model weights, quantized rendering MLPs, the occupancy
grid, and the config next to the streams.
"""

from __future__ import annotations

import functools
import json
import os
import pathlib
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EntropyConfig
from ..models.context_models import ContextModels
from . import coder, intctx

P_CLIP = 1e-6
AXES = ("xy", "xz", "yz")


def _round_up(x, m):
    return (x + m - 1) // m * m


def _scatter_set_padded(rec: jnp.ndarray, idx: np.ndarray,
                        sym: np.ndarray) -> jnp.ndarray:
    """rec.at[idx].set(sym) with idx/sym padded to a power-of-two length.

    Decode writes host-sized (covered-count) index arrays whose lengths vary
    per level/chunk; without padding every distinct length compiles a fresh
    scatter program (~15-40 s each through the tunneled backend).  Padding
    rows park at an out-of-range index and drop."""
    n = int(idx.size)
    cap = 1 << max(0, (n - 1)).bit_length()
    cap = max(cap, 8)
    f = sym.shape[1]
    idx_p = np.full((cap,), rec.shape[0], np.int32)
    idx_p[:n] = idx
    sym_p = np.zeros((cap, f), rec.dtype)
    sym_p[:n] = sym
    return rec.at[jnp.asarray(idx_p)].set(jnp.asarray(sym_p), mode="drop")


class CNCCodec:
    """Host-orchestrated encoder/decoder over a ContextModels instance.

    All per-entry probabilities run through the deterministic integer
    pipeline (codec/intctx.py): the pool programs return int32 pooled sums
    and finish with intctx.device_pq — an exact uint32 long division,
    bit-identical to the int64 host division and identical in every process
    and on every backend, which is what makes the self-contained bundle
    decodable anywhere."""

    def __init__(self, ctx: ContextModels):
        self.ctx = ctx
        self.cfg = ctx.cfg
        self._jit_cache = {}
        # static chunking per 3D context level (reference :798-810); exact
        # max chunk-vertex windows come from one shared device program
        # (ContextModels.max_window_pts) instead of per-level host cum scans
        self.chunks3d: Dict[int, Tuple[int, int, int]] = {}
        chunk_es = {}
        for l in ctx.ctx_levels_3d:
            t = ctx.tables3d[l]
            pts_per_entry = t.n_vertices / t.n_entries
            chunk_es[l] = int(min(t.n_entries,
                                  max(1, self.cfg.max_points_per_chunk /
                                      pts_per_entry)))
        sns = ([chunk_es[l] for l in ctx.ctx_levels_3d] +
               [ctx.tables2d[l].n_entries for l in ctx.ctx_levels_2d])
        wins = ctx.max_window_pts(sns)
        for i, l in enumerate(ctx.ctx_levels_3d):
            t = ctx.tables3d[l]
            chunk_e = chunk_es[l]
            n_chunks = int(np.ceil(t.n_entries / chunk_e))
            w = t.n_vertices if chunk_e >= t.n_entries else int(wins[i])
            self.chunks3d[l] = (chunk_e, n_chunks, w)
        # per-level output shifts keeping the int32 pooled sums exact even
        # for pathological hash buckets (vmax = largest vertex count of any
        # single entry, read off the cum tables via a 1-entry window query)
        vmax = np.asarray(ctx.max_window_pts(
            [1] * (len(ctx.ctx_levels_3d) + len(ctx.ctx_levels_2d))))
        self.m_shift3, self.m_scale3 = {}, {}
        self.m_shift2, self.m_scale2 = {}, {}
        for i, l in enumerate(ctx.ctx_levels_3d):
            s = max(0, int(vmax[i]).bit_length() + intctx.OVL_BITS + 14 - 30)
            self.m_shift3[l] = s
            self.m_scale3[l] = intctx.M_SCALE >> s
        for j, l in enumerate(ctx.ctx_levels_2d):
            s = max(0, int(vmax[len(ctx.ctx_levels_3d) + j]).bit_length()
                    + 14 - 30)
            self.m_shift2[l] = s
            self.m_scale2[l] = intctx.M_SCALE >> s

    # ------------------------------------------------------------- jit pool
    # The jitted wrappers finish the probability math ON DEVICE
    # (intctx.device_pq is bit-identical to host_pq — tested) and emit
    # (pq uint16, covered bool, sign bits uint8): ~13 bytes/entry pulled
    # through the relay instead of the 36 of raw msum+wsum+values int32.
    def _pool3d_fn(self, level):
        key = ("p3", level)
        fn = self._jit_cache.get(key)
        if fn is None:
            chunk_e, _, w = self.chunks3d[level]
            pool = functools.partial(
                self.ctx.pool_3d_level_int, level=level, n_e=chunk_e, w=w,
                m_shift=self.m_shift3[level])
            m_scale = self.m_scale3[level]

            def run(*args, **kw):
                msum, wsum, covered, values = pool(*args, **kw)
                return (intctx.device_pq(msum, wsum, m_scale), covered,
                        (values > 0).astype(jnp.uint8))

            fn = jax.jit(run)
            self._jit_cache[key] = fn
        return fn

    def _pool2d_fn(self, level):
        key = ("p2", level)
        fn = self._jit_cache.get(key)
        if fn is None:
            t = self.ctx.tables2d[level]
            pool = functools.partial(
                self.ctx.pool_2d_level_int, level=level, n_e=t.n_entries,
                w=t.n_points, m_shift=self.m_shift2[level])
            m_scale = self.m_scale2[level]

            def run(*args, **kw):
                msum, cnt, covered, values = pool(*args, **kw)
                return (intctx.device_pq(msum, cnt, m_scale), covered,
                        (values > 0).astype(jnp.uint8))

            fn = jax.jit(run)
            self._jit_cache[key] = fn
        return fn

    def _frac_fn(self):
        fn = self._jit_cache.get("frac")
        if fn is None:
            fn = jax.jit(self.ctx.frac_plane_int)
            self._jit_cache["frac"] = fn
        return fn

    def _stats_fn(self, which):
        """One device program per table: per-level +-1 sums (exact int32 —
        the global-Pg numerator) and MSB-first packed sign bits.  Replaces
        pulling the full fp32 table (~30x the bytes) plus a per-level
        host-slice -> device-sum -> host roundtrip for each global Pg."""
        key = ("stats", which)
        fn = self._jit_cache.get(key)
        if fn is None:
            spec = self.ctx.spec3 if which == "3d" else self.ctx.spec2

            def run(table):
                sums = jnp.stack([
                    jnp.sum(jax.lax.dynamic_slice_in_dim(
                        table, spec.offsets[l], spec.level_sizes[l]
                    ).astype(jnp.int32))
                    for l in range(spec.n_levels)])
                bits = (table > 0).astype(jnp.uint8).reshape(-1)
                pad = (-bits.size) % 8
                if pad:
                    bits = jnp.concatenate(
                        [bits, jnp.zeros((pad,), jnp.uint8)])
                weights = (1 << np.arange(7, -1, -1)).astype(np.uint8)
                packed = (bits.reshape(-1, 8) *
                          jnp.asarray(weights)[None, :]).sum(
                              axis=1, dtype=jnp.uint8)
                return sums, packed

            fn = jax.jit(run)
            self._jit_cache[key] = fn
        return fn

    def _int_params(self, ent_params):
        return jax.tree.map(jnp.asarray,
                            intctx.quantize_ctx_params(ent_params))

    @staticmethod
    def _pg_from_sum(s: int, ttl: int) -> float:
        """Global Pg of one level from its exact +-1 sum (global_pg_bits
        numerator, ops/entropy.py): pos/ttl, single-rounded to float32 —
        identical to dividing the exact integers in float32 directly, and
        exactly representable through the bundle's float32 pgs array."""
        return float(np.float32((ttl + int(s)) / 2.0 / ttl))

    @staticmethod
    def _analytic_bits(bits: np.ndarray, pq: np.ndarray) -> float:
        p = np.clip(pq.astype(np.float64) / 65536.0, P_CLIP, 1 - P_CLIP)
        return float(np.sum(np.where(bits > 0, -np.log2(p), -np.log2(1 - p))))

    # ---------------------------------------------------------------- encode
    def encode(self, ent_params, tables: Dict[str, jnp.ndarray],
               binaries: jnp.ndarray, out_dir: str, prefix: str = "b",
               cache=None):
        """Write bitstreams; returns (pgs_dict, analytic_MB, actual_MB).

        Also writes `{prefix}_checks.json`: a sha256 per stream of the coded
        symbol bits, so decode fails loudly on any desync instead of
        silently rendering a corrupted field.

        `cache`: a precomputed refresh_cache_int(binaries) — pass it when
        encode and decode run back-to-back on the same occupancy (the
        pipeline self-check) to skip the second multi-second rebuild."""
        import concurrent.futures as _fut
        import hashlib

        ctx = self.ctx
        os.makedirs(out_dir, exist_ok=True)
        if cache is None:
            cache = ctx.refresh_cache_int(binaries)
        ip = self._int_params(ent_params)
        pgs: Dict[str, float] = {}
        checks: Dict[str, str] = {}
        est_bits = 0.0
        actual_bits = 0
        # host-side range coding overlaps the next chunk's device compute
        # (the ctypes coder call releases the GIL); the reference serializes
        # GPU->CPU->torchac per level (utils_bpp_acc.py:77-93)
        pool = _fut.ThreadPoolExecutor(max_workers=8)
        pending = []

        def path(name):
            return os.path.join(out_dir, f"{prefix}_{name}.b")

        def _code_one(name, bits, pq):
            stream = coder.encode_bits(bits, pq)
            with open(path(name), "wb") as fh:
                fh.write(stream)
            return (name, hashlib.sha256(bits.tobytes()).hexdigest(),
                    self._analytic_bits(bits, pq), len(stream) * 8)

        def write(name, bits, pq):
            pending.append(pool.submit(_code_one, name,
                                       np.ascontiguousarray(bits, np.uint8),
                                       pq))

        def write_global(name, bits, pg):
            pq = coder.quantize_probs(np.full(bits.size, np.float64(pg)))
            write(name, bits, pq)

        # At encode time every table's signs are fully known, so EVERY pool
        # program (all 3D chunks of all levels, 3 planes x ctx levels, plus
        # the 3 frac planes) dispatches before any host pull: the device
        # queue stays full while the host converts + range-codes earlier
        # streams (the reference serializes GPU->CPU->torchac per level,
        # utils_bpp_acc.py:77-93).  The host never pulls the fp32 tables —
        # global Pg comes from exact per-level +-1 sums and skip-level
        # symbols from packed device sign bits (_stats_fn).
        f = self.cfg.n_features
        st3 = self._stats_fn("3d")(tables["xyz"])
        st2 = {ax: self._stats_fn("2d")(tables[ax]) for ax in AXES}
        sign3 = intctx.sign_table(tables["xyz"])
        sums3 = np.asarray(st3[0])
        for l in range(ctx.spec3.n_levels):
            pgs[f"3D{l}"] = self._pg_from_sum(
                sums3[l], ctx.spec3.level_sizes[l] * f)
        outs3 = {}
        for l in range(ctx.spec3.n_levels):
            if not (l in self.cfg.skip_levels_3d or l >= ctx.pg_level):
                outs3[l] = self._dispatch_ctx3d_level(
                    ip, sign3, cache, l, pgs[f"3D{l}"])

        plane_qs = {ax: (self._frac_fn()(sign3, cache["pn"][ax])
                         if self.cfg.use_dimension_wise else None)
                    for ax in AXES}
        pool_outs = {}
        for ai, ax in enumerate(AXES):
            sign2 = intctx.sign_table(tables[ax])
            sums2 = np.asarray(st2[ax][0])
            for l in range(ctx.spec2.n_levels):
                pg = self._pg_from_sum(sums2[l],
                                       ctx.spec2.level_sizes[l] * f)
                pgs[f"{ax}{l}"] = pg
                if not (l in self.cfg.skip_levels_2d or l >= ctx.pg_level_2d):
                    pool_outs[(ax, l)] = self._pool2d_fn(l)(
                        ip, sign2, pg_q=jnp.int32(intctx.quantize_pg(pg)),
                        plane_q=plane_qs[ax],
                        mask2d_ax=cache["mask2d"][ai], start_e=jnp.int32(0),
                        tbls=self.ctx.table_arrays)

        # --- host pulls, in stream order
        bits3 = np.unpackbits(np.asarray(st3[1]))
        for l in range(ctx.spec3.n_levels):
            off, size = ctx.spec3.offsets[l], ctx.spec3.level_sizes[l]
            if l in self.cfg.skip_levels_3d or l >= ctx.pg_level:
                write_global(f"3D{l}", bits3[off * f:(off + size) * f],
                             pgs[f"3D{l}"])
            else:
                self._pull_ctx3d_level(outs3[l], l, write)
        for ax in AXES:
            bits2 = np.unpackbits(np.asarray(st2[ax][1]))
            for l in range(ctx.spec2.n_levels):
                off, size = ctx.spec2.offsets[l], ctx.spec2.level_sizes[l]
                if l in self.cfg.skip_levels_2d or l >= ctx.pg_level_2d:
                    write_global(f"{ax}{l}", bits2[off * f:(off + size) * f],
                                 pgs[f"{ax}{l}"])
        for (ax, l), (pq_d, covered, vbits) in pool_outs.items():
            cov = np.asarray(covered)
            pq = np.asarray(pq_d)[cov].reshape(-1)
            bits = np.asarray(vbits)[cov].reshape(-1)
            write(f"{ax}{l}", bits, pq)

        for fut in pending:
            name, digest, eb, ab = fut.result()
            checks[name] = digest
            est_bits += eb
            actual_bits += ab
        pool.shutdown()
        checks["__format__"] = intctx.FORMAT_VERSION
        with open(os.path.join(out_dir, f"{prefix}_checks.json"), "w") as fh:
            json.dump(checks, fh, indent=0)
        return pgs, est_bits / 8 / 1024 / 1024, actual_bits / 8 / 1024 / 1024

    def _chunk_bounds(self, level):
        """(want_lo, want_hi, clamped_start) per chunk of one 3D level."""
        t = self.ctx.tables3d[level]
        chunk_e, n_chunks, _ = self.chunks3d[level]
        out = []
        for c in range(n_chunks):
            want_lo = c * chunk_e
            want_hi = min((c + 1) * chunk_e, t.n_entries)
            out.append((want_lo, want_hi, min(want_lo,
                                              t.n_entries - chunk_e)))
        return out

    def _dispatch_ctx3d_level(self, ip, sign3, cache, level, pg):
        """Dispatch all chunk pool programs of one context level (async)."""
        fn = self._pool3d_fn(level)
        pg_q = jnp.int32(intctx.quantize_pg(pg))
        return [fn(ip, sign3, cache, pg_q=pg_q, start_e=jnp.int32(start),
                   tbls=self.ctx.table_arrays)
                for (_, _, start) in self._chunk_bounds(level)]

    def _pull_ctx3d_level(self, outs, level, write):
        """Pull one level's dispatched chunk outputs and range-code them."""
        _, n_chunks, _ = self.chunks3d[level]
        for c, ((want_lo, want_hi, start), (pq_d, covered, vbits)) in \
                enumerate(zip(self._chunk_bounds(level), outs)):
            sl = slice(want_lo - start, want_hi - start)
            cov = np.asarray(covered)[sl]
            bits = np.asarray(vbits)[sl][cov].reshape(-1)
            pq = np.asarray(pq_d)[sl][cov].reshape(-1)
            suffix = f"3D{level}_{c}" if n_chunks > 1 else f"3D{level}"
            write(suffix, bits, pq)

    # ---------------------------------------------------------------- decode
    def decode(self, ent_params, binaries: jnp.ndarray,
               pgs: Dict[str, float], in_dir: str, prefix: str = "b",
               cache=None) -> Dict[str, jnp.ndarray]:
        """Reconstruct all four tables from the bitstreams (lossless).

        Every decoded stream's symbol bits are checked against the sha256
        recorded at encode time ({prefix}_checks.json); any mismatch raises
        — a desynced range decode must never silently ship."""
        import hashlib

        ctx = self.ctx
        if cache is None:
            cache = ctx.refresh_cache_int(binaries)
        ip = self._int_params(ent_params)
        checks_path = os.path.join(in_dir, f"{prefix}_checks.json")
        if not os.path.exists(checks_path):
            raise FileNotFoundError(
                f"{checks_path} missing: this bitstream directory predates "
                "the integer codec (round 3) or is incomplete — re-encode "
                "with the current codec; decoding without checksums could "
                "silently ship a desynced reconstruction")
        with open(checks_path) as fh:
            checks = json.load(fh)
        ver = checks.pop("__format__", None)
        if ver != intctx.FORMAT_VERSION:
            raise ValueError(
                f"bitstream format v{ver} != codec format "
                f"v{intctx.FORMAT_VERSION}: the integer context pipeline "
                "changed since this bundle was encoded — re-encode it")
        bad: List[str] = []

        def read(name):
            with open(os.path.join(in_dir, f"{prefix}_{name}.b"), "rb") as fh:
                return fh.read()

        def verify(name, bits):
            want = checks.get(name)
            if want is not None and hashlib.sha256(
                    np.ascontiguousarray(bits, np.uint8).tobytes()
            ).hexdigest() != want:
                bad.append(name)

        def decode_global(name, size, pg):
            pq = coder.quantize_probs(np.full(size, np.float64(pg)))
            bits = coder.decode_bits(read(name), pq)
            verify(name, bits)
            return bits.astype(np.int32) * 2 - 1

        f = self.cfg.n_features
        rec3 = jnp.ones((ctx.spec3.total_entries, f), jnp.int32)
        for l in range(ctx.spec3.n_levels):
            off, size = ctx.spec3.offsets[l], ctx.spec3.level_sizes[l]
            pg = float(pgs[f"3D{l}"])
            if l in self.cfg.skip_levels_3d or l >= ctx.pg_level:
                sym = decode_global(f"3D{l}", size * f, pg)
                rec3 = rec3.at[off:off + size].set(
                    jnp.asarray(sym.reshape(size, f)))
            else:
                rec3 = self._decode_ctx3d_level(ip, rec3, cache, l, pg, read,
                                                verify)

        recs = {"xyz": rec3}
        # The three planes are independent decode chains (each level's
        # context reads only ITS plane's coarser levels plus rec3), so the
        # 2D decode runs level-major in lockstep: every level, all three
        # planes' pool programs dispatch before any is pulled — device pools
        # of planes B/C overlap the host range-decode of plane A.
        rec2s = {ax: jnp.ones((ctx.spec2.total_entries, f), jnp.int32)
                 for ax in AXES}
        plane_qs = {ax: (self._frac_fn()(rec3, cache["pn"][ax])
                         if self.cfg.use_dimension_wise else None)
                    for ax in AXES}
        for l in range(ctx.spec2.n_levels):
            off, size = ctx.spec2.offsets[l], ctx.spec2.level_sizes[l]
            if l in self.cfg.skip_levels_2d or l >= ctx.pg_level_2d:
                for ax in AXES:
                    sym = decode_global(f"{ax}{l}", size * f,
                                        float(pgs[f"{ax}{l}"]))
                    rec2s[ax] = rec2s[ax].at[off:off + size].set(
                        jnp.asarray(sym.reshape(size, f)))
                continue
            t = ctx.tables2d[l]
            outs = {}
            for ai, ax in enumerate(AXES):
                outs[ax] = self._pool2d_fn(l)(
                    ip, rec2s[ax],
                    pg_q=jnp.int32(intctx.quantize_pg(float(pgs[f"{ax}{l}"]))),
                    plane_q=plane_qs[ax],
                    mask2d_ax=cache["mask2d"][ai], start_e=jnp.int32(0),
                    tbls=self.ctx.table_arrays)
            for ax in AXES:
                pq_d, covered, _ = outs[ax]
                cov = np.asarray(covered)
                pq = np.asarray(pq_d)[cov].reshape(-1)
                name = f"{ax}{l}"
                bits = coder.decode_bits(read(name), pq)
                verify(name, bits)
                sym = (bits.astype(np.int32) * 2 - 1).reshape(-1, f)
                idx = t.offset + ctx.entry_values_np("2d", l)[cov]
                rec2s[ax] = _scatter_set_padded(rec2s[ax], idx, sym)
        recs.update(rec2s)
        if bad:
            raise ValueError(
                f"codec desync: decoded symbols of stream(s) {sorted(bad)} "
                "do not match the checksums recorded at encode time — the "
                "bitstream directory is corrupt or was written by an "
                "incompatible codec version")
        return {k: v.astype(jnp.float32) for k, v in recs.items()}

    def _decode_ctx3d_level(self, ip, rec3, cache, level, pg, read, verify):
        """Decode one context level.

        The level->level dependency is strict (context reads already-decoded
        coarser levels), but WITHIN a level every chunk's context depends
        only on rec3 as it stands — so all chunk pool programs dispatch
        up-front and host range-decoding overlaps device compute; decoded
        symbols gather into one scatter at the level end."""
        ctx = self.ctx
        t = ctx.tables3d[level]
        f = self.cfg.n_features
        _, n_chunks, _ = self.chunks3d[level]
        fn = self._pool3d_fn(level)
        pg_q = jnp.int32(intctx.quantize_pg(pg))
        evals = ctx.entry_values_np("3d", level)
        outs = []
        for (want_lo, want_hi, start) in self._chunk_bounds(level):
            outs.append(fn(ip, rec3, cache, pg_q=pg_q,
                           start_e=jnp.int32(start),
                           tbls=self.ctx.table_arrays))
        idx_all, sym_all = [], []
        for c, ((want_lo, want_hi, start), (pq_d, covered, _)) in \
                enumerate(zip(self._chunk_bounds(level), outs)):
            sl = slice(want_lo - start, want_hi - start)
            cov = np.asarray(covered)[sl]
            pq = np.asarray(pq_d)[sl][cov].reshape(-1)
            suffix = f"3D{level}_{c}" if n_chunks > 1 else f"3D{level}"
            bits = coder.decode_bits(read(suffix), pq)
            verify(suffix, bits)
            idx_all.append(t.offset + evals[want_lo:want_hi][cov])
            sym_all.append((bits.astype(np.int32) * 2 - 1).reshape(-1, f))
        if idx_all:
            rec3 = _scatter_set_padded(rec3, np.concatenate(idx_all),
                                       np.concatenate(sym_all))
        return rec3


# ----------------------------------------------------------------- bundling
def quantize_mlp_params(params_tree, digits: int = 13):
    """Min/interval quantization of MLP weights (driver quantize_params,
    train_CNC_nerf_synthetic.py:30-50).  Returns (MB, MB_orig, quantized tree)."""
    leaves, treedef = jax.tree.flatten(params_tree)
    bits = 0
    bits_orig = 0
    q_leaves = []
    for p in leaves:
        p = np.asarray(p)
        mn, mx = p.min(), p.max()
        scales = 2 ** digits - 1
        interval = (mx - mn) / scales + 1e-6
        q = np.floor((p - mn) / interval)
        q_leaves.append((q * interval + mn).astype(np.float32))
        bits += digits * p.size + 64
        bits_orig += 32 * p.size
    return (bits / 8 / 1024 / 1024, bits_orig / 8 / 1024 / 1024,
            jax.tree.unflatten(treedef, q_leaves))


def save_bundle(out_dir: str, pgs: Dict[str, float], ent_params,
                mlp_params, binaries, extra_meta: Optional[dict] = None):
    """Make the bitstream directory self-contained (the reference never
    serializes Pg scalars or model weights — SURVEY.md §5).

    Pytree leaves are stored under keystr-addressed keys so load_bundle can
    rebuild the exact ent/MLP pytrees against config-derived templates."""
    from ..utils import checkpoint as ckpt

    payload = {
        "pgs_keys": np.asarray(list(pgs.keys())),
        "pgs_vals": np.asarray([pgs[k] for k in pgs], np.float32),
        "binaries": np.packbits(np.asarray(binaries).reshape(-1)),
        "binaries_shape": np.asarray(np.asarray(binaries).shape),
    }
    payload.update(ckpt._flatten(ent_params, "ent"))
    payload.update(ckpt._flatten(mlp_params, "mlp"))
    np.savez_compressed(os.path.join(out_dir, "meta.npz"), **payload)
    if extra_meta:
        with open(os.path.join(out_dir, "meta.json"), "w") as fh:
            json.dump(extra_meta, fh, indent=1)


def load_bundle(out_dir: str, ent_template=None, mlp_template=None):
    """Read the bundle back.

    With templates (pytrees of matching structure, e.g. freshly initialized
    params), returns (pgs, ent_params, mlp_params, binaries) with the
    ent/MLP PYTREES reconstructed; without, the raw flat keystr dicts."""
    from ..utils import checkpoint as ckpt

    data = dict(np.load(os.path.join(out_dir, "meta.npz")))
    pgs = {str(k): float(v) for k, v in zip(data["pgs_keys"],
                                            data["pgs_vals"])}
    shape = tuple(int(x) for x in data["binaries_shape"])
    n = int(np.prod(shape))
    binaries = np.unpackbits(data["binaries"])[:n].reshape(shape).astype(bool)
    if ent_template is not None:
        ent = ckpt._unflatten_into(ent_template, data, "ent")
    else:
        ent = {k[len("ent|"):]: v for k, v in data.items()
               if k.startswith("ent|")}
    if mlp_template is not None:
        mlp = ckpt._unflatten_into(mlp_template, data, "mlp")
    else:
        mlp = {k[len("mlp|"):]: v for k, v in data.items()
               if k.startswith("mlp|")}
    return pgs, ent, mlp, binaries


def bundle_size_mb(out_dir: str) -> float:
    total = 0
    for f in pathlib.Path(out_dir).iterdir():
        if f.suffix == ".b" or f.name == "meta.npz":
            total += f.stat().st_size
    return total / 1024 / 1024
