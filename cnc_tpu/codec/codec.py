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
from ..ops import entropy as ent_ops
from . import coder

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
    sym_p = np.zeros((cap, f), np.float32)
    sym_p[:n] = sym
    return rec.at[jnp.asarray(idx_p)].set(jnp.asarray(sym_p), mode="drop")


class CNCCodec:
    """Host-orchestrated encoder/decoder over a ContextModels instance."""

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

    # ------------------------------------------------------------- jit pool
    def _pool3d_fn(self, level):
        key = ("p3", level)
        fn = self._jit_cache.get(key)
        if fn is None:
            chunk_e, _, w = self.chunks3d[level]
            fn = jax.jit(functools.partial(
                self.ctx.pool_3d_level, level=level, n_e=chunk_e, w=w),
                static_argnames=())
            self._jit_cache[key] = fn
        return fn

    def _pool2d_fn(self, level):
        key = ("p2", level)
        fn = self._jit_cache.get(key)
        if fn is None:
            t = self.ctx.tables2d[level]
            fn = jax.jit(functools.partial(
                self.ctx.pool_2d_level, level=level, n_e=t.n_entries,
                w=t.n_points))
            self._jit_cache[key] = fn
        return fn

    def _frac_fn(self):
        fn = self._jit_cache.get("frac")
        if fn is None:
            fn = jax.jit(functools.partial(self.ctx.pn_frac_plane,
                                           sample_cap=None))
            self._jit_cache["frac"] = fn
        return fn

    @staticmethod
    def _level_pg(table, offset, size) -> np.ndarray:
        sl = table[offset:offset + size]
        pg, _, _ = ent_ops.global_pg_bits(sl)
        return np.float32(pg)

    @staticmethod
    def _analytic_bits(values: np.ndarray, p: np.ndarray) -> float:
        p = np.clip(np.asarray(p, np.float64), P_CLIP, 1 - P_CLIP)
        pos = np.asarray(values) > 0
        return float(np.sum(np.where(pos, -np.log2(p), -np.log2(1 - p))))

    # ---------------------------------------------------------------- encode
    def encode(self, ent_params, tables: Dict[str, jnp.ndarray],
               binaries: jnp.ndarray, out_dir: str, prefix: str = "b"):
        """Write bitstreams; returns (pgs_dict, analytic_MB, actual_MB)."""
        import concurrent.futures as _fut

        ctx = self.ctx
        os.makedirs(out_dir, exist_ok=True)
        cache = ctx.refresh_cache(binaries)
        pgs: Dict[str, float] = {}
        est_bits = 0.0
        actual_bits = 0
        # host-side range coding overlaps the next chunk's device compute
        # (the ctypes coder call releases the GIL); the reference serializes
        # GPU->CPU->torchac per level (utils_bpp_acc.py:77-93)
        pool = _fut.ThreadPoolExecutor(max_workers=8)
        pending = []

        def path(name):
            return os.path.join(out_dir, f"{prefix}_{name}.b")

        def _code_one(name, v, p):
            stream = coder.encode_pm1(v, p)
            with open(path(name), "wb") as fh:
                fh.write(stream)
            return self._analytic_bits(v, p), len(stream) * 8

        def write(name, values, p):
            p = np.clip(np.asarray(p, np.float32).reshape(-1), P_CLIP,
                        1 - P_CLIP)
            v = np.asarray(values, np.float32).reshape(-1)
            pending.append(pool.submit(_code_one, name, v, p))

        # --- 3D levels in order
        tbl3 = tables["xyz"]
        tbl3_np = np.asarray(tbl3)
        for l in range(ctx.spec3.n_levels):
            off, size = ctx.spec3.offsets[l], ctx.spec3.level_sizes[l]
            pg = self._level_pg(tbl3_np, off, size)
            pgs[f"3D{l}"] = float(pg)
            if l in self.cfg.skip_levels_3d or l >= ctx.pg_level:
                vals = tbl3_np[off:off + size]
                write(f"3D{l}", vals, np.full(vals.size, pg))
            else:
                self._encode_ctx3d_level(ent_params, tbl3, cache, l,
                                         jnp.float32(pg), write)

        # --- 2D planes (reference encodes planes with the trained finest 3D
        # level for the dimension-wise prior; identical to the decoded one)
        for ai, ax in enumerate(AXES):
            tbl2 = tables[ax]
            tbl2_np = np.asarray(tbl2)
            frac = (self._frac_fn()(tbl3, cache["pn"][ax])
                    if self.cfg.use_dimension_wise else None)
            for l in range(ctx.spec2.n_levels):
                off, size = ctx.spec2.offsets[l], ctx.spec2.level_sizes[l]
                pg = self._level_pg(tbl2_np, off, size)
                pgs[f"{ax}{l}"] = float(pg)
                if l in self.cfg.skip_levels_2d or l >= ctx.pg_level_2d:
                    vals = tbl2_np[off:off + size]
                    write(f"{ax}{l}", vals, np.full(vals.size, pg))
                else:
                    pooled, covered, values = self._pool2d_fn(l)(
                        ent_params, tbl2, pg_n=jnp.float32(pg),
                        frac_plane=frac, bin2d=cache["bin2d"][ai],
                        mask2d=cache["mask2d"][ai], start_e=jnp.int32(0),
                        tbls=self.ctx.table_arrays)
                    cov = np.asarray(covered)
                    write(f"{ax}{l}", np.asarray(values)[cov],
                          np.asarray(pooled)[cov])

        for fut in pending:
            eb, ab = fut.result()
            est_bits += eb
            actual_bits += ab
        pool.shutdown()
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

    def _encode_ctx3d_level(self, ent_params, tbl3, cache, level, pg, write):
        """Full-coverage encode of one context level, chunked.

        Device programs for ALL chunks are dispatched before any host pull
        (async dispatch keeps the accelerator busy while earlier chunks
        convert + range-code on host threads) — the round-1 version
        serialized dispatch -> pull -> code per chunk."""
        ctx = self.ctx
        _, n_chunks, _ = self.chunks3d[level]
        fn = self._pool3d_fn(level)
        outs = []
        for c, (want_lo, want_hi, start) in enumerate(
                self._chunk_bounds(level)):
            outs.append(fn(ent_params, tbl3, cache, pg_n=pg,
                           start_e=jnp.int32(start),
                           tbls=self.ctx.table_arrays))
        for c, ((want_lo, want_hi, start), (pooled, covered, values)) in \
                enumerate(zip(self._chunk_bounds(level), outs)):
            sl = slice(want_lo - start, want_hi - start)
            cov = np.asarray(covered)[sl]
            vals = np.asarray(values)[sl][cov]
            ps = np.asarray(pooled)[sl][cov]
            suffix = f"3D{level}_{c}" if n_chunks > 1 else f"3D{level}"
            write(suffix, vals, ps)

    # ---------------------------------------------------------------- decode
    def decode(self, ent_params, binaries: jnp.ndarray,
               pgs: Dict[str, float], in_dir: str, prefix: str = "b"
               ) -> Dict[str, jnp.ndarray]:
        """Reconstruct all four tables from the bitstreams (lossless)."""
        ctx = self.ctx
        cache = ctx.refresh_cache(binaries)

        def read(name):
            with open(os.path.join(in_dir, f"{prefix}_{name}.b"), "rb") as fh:
                return fh.read()

        f = self.cfg.n_features
        rec3 = jnp.ones((ctx.spec3.total_entries, f), jnp.float32)
        for l in range(ctx.spec3.n_levels):
            off, size = ctx.spec3.offsets[l], ctx.spec3.level_sizes[l]
            pg = np.float32(pgs[f"3D{l}"])
            if l in self.cfg.skip_levels_3d or l >= ctx.pg_level:
                sym = coder.decode_pm1(read(f"3D{l}"),
                                       np.full(size * f, np.clip(pg, P_CLIP,
                                                                 1 - P_CLIP)))
                rec3 = rec3.at[off:off + size].set(
                    jnp.asarray(sym.reshape(size, f)))
            else:
                rec3 = self._decode_ctx3d_level(ent_params, rec3, cache, l,
                                                jnp.float32(pg), read)

        recs = {"xyz": rec3}
        for ai, ax in enumerate(AXES):
            rec2 = jnp.ones((ctx.spec2.total_entries, f), jnp.float32)
            frac = (self._frac_fn()(rec3, cache["pn"][ax])
                    if self.cfg.use_dimension_wise else None)
            for l in range(ctx.spec2.n_levels):
                off, size = ctx.spec2.offsets[l], ctx.spec2.level_sizes[l]
                pg = np.float32(pgs[f"{ax}{l}"])
                if l in self.cfg.skip_levels_2d or l >= ctx.pg_level_2d:
                    sym = coder.decode_pm1(
                        read(f"{ax}{l}"),
                        np.full(size * f, np.clip(pg, P_CLIP, 1 - P_CLIP)))
                    rec2 = rec2.at[off:off + size].set(
                        jnp.asarray(sym.reshape(size, f)))
                else:
                    t = ctx.tables2d[l]
                    pooled, covered, _ = self._pool2d_fn(l)(
                        ent_params, rec2, pg_n=jnp.float32(pg),
                        frac_plane=frac, bin2d=cache["bin2d"][ai],
                        mask2d=cache["mask2d"][ai], start_e=jnp.int32(0),
                        tbls=self.ctx.table_arrays)
                    cov = np.asarray(covered)
                    ps = np.clip(np.asarray(pooled)[cov].reshape(-1),
                                 P_CLIP, 1 - P_CLIP)
                    sym = coder.decode_pm1(read(f"{ax}{l}"), ps)
                    sym = sym.reshape(-1, f)
                    idx = t.offset + ctx.entry_values_np("2d", l)[cov]
                    rec2 = _scatter_set_padded(rec2, idx,
                                               sym.astype(np.float32))
            recs[ax] = rec2
        return recs

    def _decode_ctx3d_level(self, ent_params, rec3, cache, level, pg, read):
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
        evals = ctx.entry_values_np("3d", level)
        outs = []
        for (want_lo, want_hi, start) in self._chunk_bounds(level):
            outs.append(fn(ent_params, rec3, cache, pg_n=pg,
                           start_e=jnp.int32(start),
                           tbls=self.ctx.table_arrays))
        idx_all, sym_all = [], []
        for c, ((want_lo, want_hi, start), (pooled, covered, _)) in \
                enumerate(zip(self._chunk_bounds(level), outs)):
            sl = slice(want_lo - start, want_hi - start)
            cov = np.asarray(covered)[sl]
            ps = np.clip(np.asarray(pooled)[sl][cov].reshape(-1),
                         P_CLIP, 1 - P_CLIP)
            suffix = f"3D{level}_{c}" if n_chunks > 1 else f"3D{level}"
            sym = coder.decode_pm1(read(suffix), ps).reshape(-1, f)
            idx_all.append(t.offset + evals[want_lo:want_hi][cov])
            sym_all.append(sym)
        if idx_all:
            rec3 = _scatter_set_padded(rec3, np.concatenate(idx_all),
                                       np.concatenate(sym_all,
                                                      dtype=np.float32))
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
