"""CNC context models: level-wise + occupancy + dimension-wise priors.

TPU-native re-design of CNC_context_models (reference examples/
utils_bpp_acc.py:193-706).  The reference materializes ragged per-hash-entry
vertex groups with CUDA pack/align kernels; here every ragged structure is
precomputed once on the host into *static sorted tables* (vertex lists sorted
by hash entry, with per-vertex entry ordinals), so the per-step work is pure
gather / segmented-scan / dense math under jit:

  * 3D context levels: per step a random contiguous window of entries is
    sampled per level (utils_bpp_acc.py:631-634); its vertex window is a
    dynamic_slice of the static sorted vertex table, masked by the occupancy
    prior, compacted to a static budget, context-encoded at mixed levels in
    one call, pooled per entry by overlap-area weights, and billed with the
    Bernoulli model, extrapolated to the full table (:700).
  * occupancy masks and overlap-area weights come from dense per-level grids
    rebuilt every occupancy refresh with separable SAT pools — replacing the
    per-vertex cell walks of query_mask_3D (aligner_kernel.cu:162-242).
  * 2D tri-plane levels: the reference enumerates (T+2)^2 lattice blocks of
    occupied projection cells (fetch_2D_batches, :431-456); the full block
    lattice is static, so it is precomputed sorted-by-entry once, and per step
    the occupied-block validity is a single gather — optionally window-sampled
    like the 3D levels (a TPU adaptation; encode/decode always use full
    coverage).
  * the dimension-wise prior (sign histogram of the finest 3D level projected
    to a plane, _cnt_np_embed / gridencoder.cu:873-1019) uses a coord list
    sorted by projected bin, making the histogram a cumsum + boundary
    difference instead of an atomic scatter.

Skip levels and levels beyond Pg_level are billed at the level's global
Bernoulli probability (get_BiRF_wentropy_leveln, :472-486).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EntropyConfig, GridSpec
from ..ops import encoding as enc
from ..ops import entropy as ent_ops
from ..ops import hash_ops
from ..ops import scatter_ops


# --------------------------------------------------------------------------
# straight-through positive-sign indicator used by the dimension-wise prior:
# forward counts entries > 0.9 like cnt_np_embed_kernel (gridencoder.cu:909),
# backward routes gradient only to positive entries (cu:1011-1018).
@jax.custom_vjp
def _pos_indicator(e):
    return (e > 0.9).astype(jnp.float32)


def _pos_indicator_fwd(e):
    return _pos_indicator(e), e


def _pos_indicator_bwd(e, g):
    return (jnp.where(e > 0.9, g, 0.0),)


_pos_indicator.defvjp(_pos_indicator_fwd, _pos_indicator_bwd)


def _leaky_relu(x):
    return jax.nn.leaky_relu(x, 0.01)


def _linear_init(key, fan_in, fan_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    return {"w": jax.random.uniform(kw, (fan_in, fan_out), minval=-bound,
                                    maxval=bound),
            "b": jax.random.uniform(kb, (fan_out,), minval=-bound,
                                    maxval=bound)}


class Level3DTable(NamedTuple):
    """Static per-level vertex->entry metadata (utils_bpp_acc.py:296-348).

    The array data itself lives in the CONCATENATED device buffers of
    ContextModels.table_arrays['3d'] (pos_flat / vert_entry sorted by entry;
    entry_values / cum padded to e_max per level); the static offsets here
    locate this level's slice.  Concatenation keeps the whole build inside
    two jit programs regardless of level count — per-level programs cost
    ~15-40 s each of compile + executable load through the tunneled backend
    (the round-1 build took 1033 s for ~26 of them).
    """
    level: int
    resolution: int
    offset: int                # into the flat hash table (spec offsets)
    n_entries: int             # exact distinct entries (data-dependent)
    n_vertices: int
    sample_n: int
    max_win_pts: int
    v_off: int                 # start into concat pos_flat / vert_entry
    e_off: int                 # start into concat entry_values
    c_off: int                 # start into concat cum (this level: e_max+1)
    e_max: int                 # padded entry capacity = min(table, V)


class Level2DTable(NamedTuple):
    """Static block-lattice metadata shared by the three planes (same
    concatenated-buffer layout as Level3DTable, in table_arrays['2d'])."""
    level: int
    resolution: int
    offset: int
    tile: int                  # T = (res-2)/Rb
    n_points: int
    n_entries: int
    sample_n: int
    max_win_pts: int
    v_off: int
    e_off: int
    c_off: int
    e_max: int


def _segment_tail_values(x: jnp.ndarray, seg: jnp.ndarray, valid: jnp.ndarray,
                         num_segments: int):
    """Per-segment sums of x (masked by valid) over sorted contiguous seg ids.

    One plain masked scatter-add (invalid rows routed out of range and
    dropped; no sortedness hint — routing invalid rows to num_segments breaks
    global order in concatenated multi-window buffers).  Replaced a chunked
    segmented-scan design: XLA's scatter-add into a small target measures
    ~13-20 ns/row on TPU v5e while the associative_scan machinery cost
    minutes of compile.
    Returns [num_segments, ...] sums (zero where no valid element).
    """
    seg_safe = jnp.where(valid, seg, num_segments)
    out = jnp.zeros((num_segments,) + x.shape[1:], x.dtype)
    if x.ndim == 1:
        return out.at[seg_safe].add(jnp.where(valid, x, 0.0), mode="drop")
    return out.at[seg_safe].add(jnp.where(valid[:, None], x, 0.0),
                                mode="drop")


def _window_slices(a: Dict, names, v_off: int, start_v, end_v, w: int,
                   v_total: int):
    """Slice [start_v, start_v+w) of each named level buffer, end-safe.

    A window of static capacity w whose dynamic start lies near the end of
    the level's vertex segment would run past the concatenated buffer's end
    for the LAST level; XLA then clamps the slice start BACKWARD, silently
    shifting every element — the tail entries' vertices land past the naive
    `arange(w) < end_v - start_v` mask and pool to "uncovered" (a decode
    left such entries at the +1 default while the pn prior read their
    trained sign: the round-3 desync bug).  This helper clamps the start
    itself to min(start_v, v_total - w) and returns a `valid` mask marking
    the true [start_v, end_v) window inside the shifted slice, so callers
    stay exact for every window position.  Shifted-in head elements carry
    slots of earlier entries (clipped by callers) and are valid=False.
    """
    start_c = jnp.minimum(start_v, v_total - w)
    outs = [jax.lax.dynamic_slice(a[n], (v_off + start_c,), (w,))
            for n in names]
    i = jnp.arange(w)
    shift = start_v - start_c
    valid = (i >= shift) & (i < shift + (end_v - start_v))
    return outs, valid


class ContextModels:
    """CNC entropy model over four binarized hash tables.

    Hosts the static tables, the jit-refreshed occupancy cache, the training
    rate estimate (differentiable), and the full-coverage probability
    computation used by the codec.
    """

    def __init__(self, ecfg: EntropyConfig, spec3: GridSpec, spec2: GridSpec):
        self.cfg = ecfg
        self.spec3 = spec3
        self.spec2 = spec2
        self.rb = ecfg.Rb
        f = ecfg.n_features
        assert spec3.n_features == f and spec2.n_features == f

        pg3 = ecfg.Pg_level
        if pg3 < 0 or pg3 >= spec3.n_levels:
            pg3 = spec3.n_levels
        pg3 = max(pg3, 1)
        self.pg_level = pg3
        pg2 = ecfg.Pg_level_2D
        if pg2 < 0 or pg2 >= spec2.n_levels:
            pg2 = spec2.n_levels
        pg2 = max(pg2, 1)
        self.pg_level_2d = pg2

        self.ctx_levels_3d = [l for l in range(pg3)
                              if l not in ecfg.skip_levels_3d]
        # context encodes read the k strictly-coarser levels (utils_bpp_acc.py
        # :684-685); the reference guarantees l >= k via its skip levels
        for l in self.ctx_levels_3d:
            if l < ecfg.max_context_layer_num:
                raise ValueError(
                    f"3D context level {l} < max_context_layer_num "
                    f"{ecfg.max_context_layer_num}; add it to skip_levels_3d")
        self.ctx_levels_2d = [l for l in range(pg2)
                              if l not in ecfg.skip_levels_2d]

        self._build_tables()

        # totals for the extrapolation (utils_bpp_acc.py:350-366)
        self.ttl_entries_valid_3d = sum(
            self.tables3d[l].n_entries for l in self.ctx_levels_3d)
        self.ttl_sample_valid_3d = sum(
            self.tables3d[l].sample_n for l in self.ctx_levels_3d)
        self.v_window_total = sum(
            self.tables3d[l].max_win_pts for l in self.ctx_levels_3d)

        # finest-level info for the dimension-wise prior
        self.fine_res = spec3.resolutions[-1]          # 514
        self.fine_offset = spec3.offsets[-2]
        self.fine_size = spec3.level_sizes[-1]
        self.pn_res = self.fine_res                    # frac plane resolution

    # ---------------------------------------------------------- device init
    # The vertex->entry tables are built ON DEVICE in a SINGLE fused jit
    # program covering every level (a 514^3 hash+sort takes ~1 s on TPU,
    # while building on the host costs minutes of single-core numpy plus a
    # ~2GB transfer at a few MB/s through the tunneled backend).  Hashed
    # levels share ONE sort via level-tagged keys; per-level entry arrays are
    # padded to static capacities so only one small scalar array (the exact
    # entry counts) crosses to the host.  The round-1 per-level two-stage
    # design compiled ~26 programs at ~15-40 s of compile + executable-load
    # each through the tunneled backend (1033 s total); this takes two.
    _KEY_BASE = 1 << 20        # > any level table size (2**19 rounded to 8)

    def _level_plans(self):
        """Static per-level build plans (ctx 3D levels then ctx 2D levels)."""
        plans = []
        for l in self.ctx_levels_3d:
            r = self.spec3.resolutions[l]
            tbl = self.spec3.level_sizes[l]
            v = r ** 3
            plans.append(dict(kind="3d", level=l, r=r, tbl=tbl, v=v,
                              dense=v <= tbl, e_max=min(tbl, v)))
        rb = self.rb
        for l in self.ctx_levels_2d:
            r = self.spec2.resolutions[l]
            tile = (r - 2) // rb
            assert (r - 2) % rb == 0, "2D resolutions must be multiples of Rb"
            p = rb * rb * (tile + 2) ** 2
            # the 2D block lattice revisits boundary coords (blocks overlap
            # by 2), so even "dense" levels are non-injective -> sort path
            plans.append(dict(kind="2d", level=l, r=r,
                              tbl=self.spec2.level_sizes[l], v=p,
                              dense=False, tile=tile,
                              e_max=min(self.spec2.level_sizes[l], p)))
        return plans

    @staticmethod
    def _coords_2d(ids, tile, rb):
        """Block-lattice coords: point j of block (bi,bj) at offsets (oi,oj)
        (fetch_2D_batches, utils_bpp_acc.py:443-448)."""
        per_block = (tile + 2) ** 2
        blk = ids // per_block
        off = ids % per_block
        bi, bj = blk // rb, blk % rb
        oi, oj = off // (tile + 2), off % (tile + 2)
        return bi * tile + oi, bj * tile + oj, blk

    def _fused_build_impl(self):
        """One traced program building every level's sorted vertex tables.

        Returns a dict of concatenated arrays (per kind) plus the exact
        entry count per plan.  The dense-3D-level shuffle uses a fixed
        per-level PRNG key so both codec sides rebuild the same order."""
        plans = self._level_plans()
        rb = self.rb
        kb = self._KEY_BASE
        # level-tagged keys o*kb+idx must stay distinct across levels and
        # within int32 (ADVICE r2: a log2_hashmap_size >= 20 config would
        # silently overlap adjacent levels' key ranges)
        max_idx = max((p["tbl"] for p in plans), default=0)
        assert max_idx <= kb, (
            f"level table size {max_idx} exceeds sort-key base {kb}; raise "
            "ContextModels._KEY_BASE")
        n_sort = sum(1 for p in plans if not p["dense"])
        assert n_sort * kb + max_idx < 2 ** 31, "sort keys overflow int32"

        # ---- sort members: hashed 3D + all 2D, one level-tagged key space
        keys, locs = [], []
        inv_maps = {}
        sort_plans = [p for p in plans if not p["dense"]]
        for o, p in enumerate(sort_plans):
            ids = jnp.arange(p["v"], dtype=jnp.int32)
            if p["kind"] == "3d":
                r = p["r"]
                coords = jnp.stack([ids // (r * r), (ids // r) % r,
                                    ids % r], -1)
            else:
                x, y, _ = self._coords_2d(ids, p["tile"], rb)
                coords = jnp.stack([x, y], -1)
            idx = hash_ops.grid_index(coords, p["r"], p["tbl"])
            if p["kind"] == "2d":
                # shuffle the entry ORDER so sampled entry windows aren't
                # raster slabs on dense 2D levels (the reference shuffles
                # its non-colliding levels for the same reason,
                # utils_bpp_acc.py:311-315); fixed threefry key => every
                # process/backend rebuilds the same order
                perm = jax.random.permutation(
                    jax.random.PRNGKey(4321 + p["level"]),
                    p["tbl"]).astype(jnp.int32)
                inv_maps[o] = jnp.zeros((p["tbl"],), jnp.int32).at[perm].set(
                    jnp.arange(p["tbl"], dtype=jnp.int32),
                    unique_indices=True)
                idx = perm[idx]
            keys.append(jnp.int32(o * kb) + idx)
            locs.append(ids)
        out3 = {"pos_flat": [], "vert_entry": [], "entry_values": [],
                "cum": []}
        out2 = {"coords": [], "block_id": [], "vert_entry": [],
                "entry_values": [], "cum": []}
        sorted_parts = {}
        if sort_plans:
            skey, sloc = jax.lax.sort(
                (jnp.concatenate(keys), jnp.concatenate(locs)), num_keys=1)
            head = jnp.concatenate([jnp.ones((1,), bool),
                                    skey[1:] != skey[:-1]])
            hc = jnp.cumsum(head.astype(jnp.int32))
            off = 0
            for o, p in enumerate(sort_plans):
                v, e_max = p["v"], p["e_max"]
                sl = slice(off, off + v)
                idx_l = skey[sl] - jnp.int32(o * kb)
                # level boundaries always change the key => head[off] is True
                ords = hc[sl] - hc[off]          # level-local entry ordinal
                head_l = head[sl]
                starts = jnp.arange(v, dtype=jnp.int32)
                tgt = jnp.where(head_l, ords, e_max + 1)
                # cum[e] = first vertex of entry e; parked at V beyond the
                # exact entry count so tail counts/windows come out right
                cum = jnp.full((e_max + 1,), v, jnp.int32).at[tgt].set(
                    starts, mode="drop", unique_indices=True)
                values = jnp.zeros((e_max,), jnp.int32).at[
                    jnp.where(head_l, ords, e_max)].set(
                        idx_l, mode="drop", unique_indices=True)
                if o in inv_maps:   # un-shuffle back to real table indices
                    values = inv_maps[o][values]
                n_e = hc[off + v - 1] - hc[off] + 1
                sorted_parts[(p["kind"], p["level"])] = dict(
                    loc=sloc[sl], vert_entry=ords, values=values, cum=cum,
                    n_e=n_e)
                off += v

        n_entries = []
        for p in plans:
            if p["dense"]:
                # dense 3D level: grid_index is a bijection onto [0, V);
                # shuffled entry order for unbiased window sampling
                v, r = p["v"], p["r"]
                ids = jnp.arange(v, dtype=jnp.int32)
                coords = jnp.stack([ids // (r * r), (ids // r) % r,
                                    ids % r], -1)
                idx = hash_ops.grid_index(coords, r, p["tbl"])
                inv = jnp.zeros((v,), jnp.int32).at[idx].set(
                    ids, unique_indices=True)
                perm = jax.random.permutation(
                    jax.random.PRNGKey(1234 + p["level"]),
                    v).astype(jnp.int32)
                out3["pos_flat"].append(inv[perm])
                out3["vert_entry"].append(ids)
                out3["entry_values"].append(perm)
                out3["cum"].append(jnp.arange(v + 1, dtype=jnp.int32))
                n_entries.append(jnp.int32(v))
            else:
                s = sorted_parts[(p["kind"], p["level"])]
                if p["kind"] == "3d":
                    out3["pos_flat"].append(s["loc"])
                    out3["vert_entry"].append(s["vert_entry"])
                    out3["entry_values"].append(s["values"])
                    out3["cum"].append(s["cum"])
                else:
                    x, y, blk = self._coords_2d(s["loc"], p["tile"], rb)
                    out2["coords"].append((x << 16) | y)
                    out2["block_id"].append(blk)
                    out2["vert_entry"].append(s["vert_entry"])
                    out2["entry_values"].append(s["values"])
                    out2["cum"].append(s["cum"])
                n_entries.append(s["n_e"])
        res = {"n_entries": jnp.stack(n_entries)}
        for k, v in out3.items():
            if v:
                res["3d_" + k] = jnp.concatenate(v)
        for k, v in out2.items():
            if v:
                res["2d_" + k] = jnp.concatenate(v)
        return res

    def _win_sizes_impl(self, cum3, cum2, sn, ne):
        """Per-plan max vertex-window size over all sn-entry windows.

        win(i) = cum[i+sn] - cum[i] maximized over starts i <= n_e - sn;
        sn/ne are dynamic args so ONE compile serves every quota (training
        windows AND codec chunk windows).  Plan order = _level_plans."""
        outs = []
        for i, t in enumerate(self._all_tables_in_plan_order()):
            cum = cum3 if isinstance(t, Level3DTable) else cum2
            c = jax.lax.dynamic_slice(cum, (t.c_off,), (t.e_max + 1,))
            idx = jnp.arange(t.e_max + 1, dtype=jnp.int32)
            upper = jnp.take(c, jnp.minimum(idx + sn[i], t.e_max), axis=0)
            ok = idx <= ne[i] - sn[i]
            outs.append(jnp.max(jnp.where(ok, upper - c, 0)))
        return jnp.stack(outs)

    def _all_tables_in_plan_order(self):
        return ([self.tables3d[l] for l in self.ctx_levels_3d] +
                [self.tables2d[l] for l in self.ctx_levels_2d])

    def max_window_pts(self, sample_ns: Sequence[int]) -> np.ndarray:
        """Host entry: exact max vertex-window sizes for per-plan window
        lengths (plan order: ctx 3D levels then ctx 2D levels)."""
        fn = getattr(self, "_win_jit", None)
        if fn is None:
            fn = jax.jit(self._win_sizes_impl)
            self._win_jit = fn
        ne = np.asarray([t.n_entries
                         for t in self._all_tables_in_plan_order()], np.int32)
        cum3 = self._arrays3d.get("cum", jnp.zeros((0,), jnp.int32))
        cum2 = self._arrays2d.get("cum", jnp.zeros((0,), jnp.int32))
        out = fn(cum3, cum2, jnp.asarray(np.asarray(sample_ns, np.int32)),
                 jnp.asarray(ne))
        return np.asarray(out)

    def _build_tables(self):
        ecfg, spec3, spec2 = self.cfg, self.spec3, self.spec2
        plans = self._level_plans()

        # static concat offsets per plan
        offs = {"3d": {"v": 0, "e": 0, "c": 0},
                "2d": {"v": 0, "e": 0, "c": 0}}
        meta = []
        for p in plans:
            o = offs[p["kind"]]
            meta.append(dict(v_off=o["v"], e_off=o["e"], c_off=o["c"]))
            o["v"] += p["v"]
            o["e"] += p["e_max"]
            o["c"] += p["e_max"] + 1

        fn = jax.jit(self._fused_build_impl)
        res = fn()
        n_entries = np.asarray(res["n_entries"])   # the one host sync

        self._arrays3d = {k: res["3d_" + k]
                          for k in ("pos_flat", "vert_entry", "entry_values",
                                    "cum") if "3d_" + k in res}
        self._arrays2d = {k: res["2d_" + k]
                          for k in ("coords", "block_id", "vert_entry",
                                    "entry_values", "cum") if "2d_" + k in res}

        self.tables3d: Dict[int, Level3DTable] = {}
        self.tables2d: Dict[int, Level2DTable] = {}
        for i, (p, m) in enumerate(zip(plans, meta)):
            e = int(n_entries[i])
            if p["kind"] == "3d":
                self.tables3d[p["level"]] = Level3DTable(
                    level=p["level"], resolution=p["r"],
                    offset=spec3.offsets[p["level"]], n_entries=e,
                    n_vertices=p["v"], sample_n=0, max_win_pts=0,
                    v_off=m["v_off"], e_off=m["e_off"], c_off=m["c_off"],
                    e_max=p["e_max"])
            else:
                self.tables2d[p["level"]] = Level2DTable(
                    level=p["level"], resolution=p["r"],
                    offset=spec2.offsets[p["level"]], tile=p["tile"],
                    n_points=p["v"], n_entries=e, sample_n=0, max_win_pts=0,
                    v_off=m["v_off"], e_off=m["e_off"], c_off=m["c_off"],
                    e_max=p["e_max"])

        # ---- proportional entry sampling quotas (utils_bpp_acc.py:350-352)
        entry_counts = []
        for l in range(self.pg_level):
            if l in self.cfg.skip_levels_3d:
                r = spec3.resolutions[l]
                entry_counts.append(min(spec3.level_sizes[l], r ** 3))
            else:
                entry_counts.append(self.tables3d[l].n_entries)
        counts_arr = np.asarray(entry_counts, np.float64)
        sample = np.round(counts_arr * (self.cfg.sample_num /
                                        counts_arr.sum()))
        if sample[-1] > counts_arr[-1]:
            sample = counts_arr
        sample = sample.astype(np.int64)
        sn3 = {}
        for l in self.ctx_levels_3d:
            t = self.tables3d[l]
            sn3[l] = max(1, int(min(sample[l], t.n_entries)))

        # ---- 2D quotas (TPU adaptation; None = full lattice per step)
        sn2cfg = getattr(ecfg, "sample_num_2d", None)
        sn2 = {}
        tot2 = sum(self.tables2d[l].n_entries for l in self.ctx_levels_2d)
        for l in self.ctx_levels_2d:
            t = self.tables2d[l]
            if sn2cfg:
                sn2[l] = max(1, min(int(round(t.n_entries * sn2cfg / tot2)),
                                    t.n_entries))
            else:
                sn2[l] = t.n_entries

        # ---- exact window capacities, one shared program
        sns = ([sn3[l] for l in self.ctx_levels_3d] +
               [sn2[l] for l in self.ctx_levels_2d])
        wins = self.max_window_pts(sns)
        i = 0
        for l in self.ctx_levels_3d:
            t = self.tables3d[l]
            w = t.n_vertices if sn3[l] >= t.n_entries else int(wins[i])
            self.tables3d[l] = t._replace(sample_n=sn3[l], max_win_pts=w)
            i += 1
        for l in self.ctx_levels_2d:
            t = self.tables2d[l]
            w = t.n_points if sn2[l] >= t.n_entries else int(wins[i])
            self.tables2d[l] = t._replace(sample_n=sn2[l], max_win_pts=w)
            i += 1

    # ------------------------------------------------------- table arg pytree
    @property
    def table_arrays(self) -> Dict:
        """Concatenated vertex-table device arrays as a pytree for passing
        INTO jits; per-level slices are located by the static offsets in
        Level3DTable / Level2DTable.

        Through the tunneled axon backend, a device array captured as a jit
        closure constant is fetched to host during lowering at ~7 s/MB
        (measured); these tables total hundreds of MB at flagship scale, so
        every jitted rate/pool function takes them as an argument instead.
        """
        return {"3d": self._arrays3d, "2d": self._arrays2d}

    def level_arrays_np(self, kind: str, level: int) -> Dict[str, np.ndarray]:
        """Host view of one level's table slices (tests/tools/debug): keys
        pos_flat|coords, block_id, vert_entry ([V]), entry_values
        ([n_entries]), cum ([n_entries+1])."""
        t = (self.tables3d if kind == "3d" else self.tables2d)[level]
        arrays = self._arrays3d if kind == "3d" else self._arrays2d
        v = t.n_vertices if kind == "3d" else t.n_points
        out = {}
        for k, arr in arrays.items():
            a = np.asarray(arr)
            if k in ("entry_values",):
                out[k] = a[t.e_off:t.e_off + t.n_entries]
            elif k == "cum":
                out[k] = a[t.c_off:t.c_off + t.n_entries + 1]
            else:
                out[k] = a[t.v_off:t.v_off + v]
        return out

    def entry_values_np(self, kind: str, level: int) -> np.ndarray:
        """Host copy of one level's entry_values[:n_entries] (codec decode
        scatter targets); the concat buffer is fetched once and cached."""
        cached = getattr(self, "_evals_np", None)
        if cached is None:
            cached = {
                "3d": (np.asarray(self._arrays3d["entry_values"])
                       if self._arrays3d else np.zeros(0, np.int32)),
                "2d": (np.asarray(self._arrays2d["entry_values"])
                       if self._arrays2d else np.zeros(0, np.int32))}
            self._evals_np = cached
        t = (self.tables3d if kind == "3d" else self.tables2d)[level]
        return cached[kind][t.e_off:t.e_off + t.n_entries]
    # --------------------------------------------------------------- params
    def init_params(self, key) -> Dict:
        f = self.cfg.n_features
        k = self.cfg.max_context_layer_num
        keys = jax.random.split(key, 3 + len(self.ctx_levels_2d))
        params = {
            # MLP(3F+1 -> 32 -> 32 -> F), LeakyReLU (utils_bpp_acc.py:378-384)
            "ctx3d": {
                "l0": _linear_init(keys[0], f * k + 1, 32),
                "l1": _linear_init(keys[1], 32, 32),
                "l2": _linear_init(keys[2], 32, f),
            },
            # per-level Linear(F*(min(n,k)+dim_wise)+1 -> F) (:386-393)
            "ctx2d": {},
        }
        for i, l in enumerate(self.ctx_levels_2d):
            cln = min(l, k)
            fan_in = f * (cln + int(self.cfg.use_dimension_wise)) + 1
            params["ctx2d"][str(l)] = _linear_init(keys[3 + i], fan_in, f)
        return params

    def param_count(self, params) -> int:
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))

    def apply_ctx3d(self, p, x):
        h = _leaky_relu(x @ p["l0"]["w"] + p["l0"]["b"])
        h = _leaky_relu(h @ p["l1"]["w"] + p["l1"]["b"])
        return h @ p["l2"]["w"] + p["l2"]["b"]

    def apply_ctx2d(self, p, level, x):
        pl_ = p[str(level)]
        return x @ pl_["w"] + pl_["b"]

    # ---------------------------------------------------------------- cache
    def init_cache(self) -> Dict:
        """Zero-filled cache with the static shapes refresh_cache produces."""
        rb = self.rb
        m3_total = sum(r ** 3 for r in self.spec3.resolutions)
        m2_total = sum(r ** 2 for r in self.mask2d_resolutions)
        cache = {
            "bin2d": jnp.zeros((3, rb, rb), bool),
            "mask3d": jnp.zeros((m3_total,), bool),
            "mask2d": jnp.zeros((3, m2_total), bool),
            "ovl": {},
        }
        for l in self.ctx_levels_3d:
            r = self.tables3d[l].resolution
            cache["ovl"][str(l)] = jnp.zeros((r ** 3,), jnp.float32)
        cap = self.cfg.pn_coords_cap
        cache["pn"] = {ax: {
            "entry_idx": jnp.zeros((cap,), jnp.int32),
            "n": jnp.zeros((), jnp.int32),
            "bounds": jnp.zeros(((self.pn_res - 2) ** 2 + 1,), jnp.int32),
        } for ax in ("xy", "xz", "yz")}
        return cache

    def _check_binaries(self, binaries):
        # Rb is BOTH the entropy block size and the occupancy resolution the
        # footprint/pn machinery assumes (reference couples them the same
        # way, utils_bpp_acc.py:194-228 with binary_vxl 128^3 and Rb=128).
        # A RenderConfig.occ_resolution != Rb silently produced garbage pn
        # dilation (round-3 sweep config) — fail loudly instead.
        if binaries.shape != (self.rb,) * 3:
            raise ValueError(
                f"occupancy grid shape {binaries.shape} != (Rb,)*3 with "
                f"Rb={self.rb}: EntropyConfig.Rb must equal "
                "RenderConfig.occ_resolution")

    def refresh_cache(self, binaries: jnp.ndarray, old_cache=None) -> Dict:
        self._check_binaries(binaries)
        fn = getattr(self, "_refresh_jit", None)
        if fn is None:
            fn = jax.jit(self._refresh_impl)
            self._refresh_jit = fn
        return fn(binaries)

    def _refresh_impl(self, binaries):
        rb = self.rb
        cache = {}
        bin2d = jnp.stack([jnp.any(binaries, axis=2),   # xy
                           jnp.any(binaries, axis=1),   # xz
                           jnp.any(binaries, axis=0)])  # yz
        cache["bin2d"] = bin2d
        # flat per-corner mask grids over ALL levels: the encoder and pooling
        # gather ONE bool per corner instead of 2^D SAT reads (the SAT box
        # query was ~1/3 of the whole rate3d forward)
        m3 = []
        cache["ovl"] = {}
        for l in range(self.spec3.n_levels):
            r = self.spec3.resolutions[l]
            if l in self.ctx_levels_3d:
                m, o = _dense_mask_overlap_grids(binaries, r, rb)
                cache["ovl"][str(l)] = o.reshape(-1)
            else:
                m = _dense_mask_grid(binaries, r, rb)
            m3.append(m.reshape(-1))
        cache["mask3d"] = jnp.concatenate(m3)
        m2 = []
        for ai in range(3):
            m2.append(jnp.concatenate(
                [_dense_mask_grid(bin2d[ai], r, rb).reshape(-1)
                 for r in self.mask2d_resolutions]))
        cache["mask2d"] = jnp.stack(m2)
        cache["pn"] = self._refresh_pn_coords(binaries)
        return cache

    @property
    def mask3d_offsets(self):
        """Per-3D-level start offsets into the flat cache['mask3d']."""
        offs = [0]
        for r in self.spec3.resolutions:
            offs.append(offs[-1] + r ** 3)
        return tuple(offs[:-1])

    @property
    def mask2d_resolutions(self):
        """Resolutions covered by cache['mask2d'] per axis: every 2D level
        plus (if absent) the dimension-wise prior's plane resolution."""
        res = list(self.spec2.resolutions)
        if self.pn_res not in res:
            res.append(self.pn_res)
        return tuple(res)

    @property
    def mask2d_offsets(self):
        offs = [0]
        for r in self.mask2d_resolutions:
            offs.append(offs[-1] + r ** 2)
        return tuple(offs[:-1])

    @property
    def pn_mask_offset(self):
        return self.mask2d_offsets[
            self.mask2d_resolutions.index(self.pn_res)]

    def _refresh_pn_coords(self, binaries):
        """Dilated occupied coord lists sorted by projected bin (per axis).

        Replaces get_idx_coords2 (utils_bpp_acc.py:498-512): occupied 128^3
        cells upsampled x(scale/Rb) and dilated by one fine cell, then +1
        shift into the (scale+2)-resolution lattice.  The coord list is
        compacted to a static cap and reduced to per-axis (bin-sorted hashed
        finest-level entry indices + static bin boundaries).
        """
        rb = self.rb
        scale = self.pn_res - 2                       # 512
        assert scale % rb == 0, "finest 3D resolution-2 must be a multiple of Rb"
        t = scale // rb
        cap = self.cfg.pn_coords_cap
        # dense dilated mask on the scale^3 lattice (coords 1..scale after
        # the +1 shift; border coords are dropped by cnt_np_embed anyway,
        # gridencoder.cu:895-898, so we only enumerate the interior lattice)
        up = jnp.repeat(jnp.repeat(jnp.repeat(binaries, t, 0), t, 1), t, 2)

        def dilate1(x, axis):
            pad = [(0, 0)] * 3
            pad[axis] = (1, 1)
            p = jnp.pad(x, pad)
            n = x.shape[axis]
            return (jax.lax.slice_in_dim(p, 0, n, axis=axis)
                    | jax.lax.slice_in_dim(p, 1, n + 1, axis=axis)
                    | jax.lax.slice_in_dim(p, 2, n + 2, axis=axis))

        dil = dilate1(dilate1(dilate1(up, 0), 1), 2)
        # dil[i,j,k] true => lattice coord (i+1, j+1, k+1) is in the list
        out = {}
        flat = dil.reshape(-1)
        src, n = scatter_ops.compact_mask_indices(flat, cap)
        valid = jnp.arange(cap) < jnp.minimum(n, cap)
        x = src // (scale * scale)
        y = (src // scale) % scale
        z = src % scale
        coords = jnp.stack([x + 1, y + 1, z + 1], -1)  # lattice coords 1..scale
        eidx = hash_ops.grid_index(coords, self.pn_res, self.fine_size)
        for ax, (a, b) in (("xy", (0, 1)), ("xz", (0, 2)), ("yz", (1, 2))):
            bins = (coords[:, a] - 1) * scale + (coords[:, b] - 1)
            bins = jnp.where(valid, bins, scale * scale)  # park invalid at end
            order = jnp.argsort(bins)
            bins_s = bins[order]
            eidx_s = jnp.where(valid[order], eidx[order], 0)
            bounds = jnp.searchsorted(
                bins_s, jnp.arange(scale * scale + 1, dtype=jnp.int32))
            out[ax] = {"entry_idx": eidx_s.astype(jnp.int32), "n": n,
                       "bounds": bounds.astype(jnp.int32)}
        return out

    # ------------------------------------------------- dimension-wise prior
    def pn_frac_plane(self, table3d_q: jnp.ndarray, pn_ax: Dict,
                      sample_cap: Optional[int] = None,
                      axis_name: Optional[str] = None) -> jnp.ndarray:
        """Positive-sign fraction plane [pn_res**2, F] (x-fastest flat).

        get_pn_embed_frac (utils_bpp_acc.py:515-530): histogram the signs of
        the finest-level entries at the cached coords, per projected bin;
        frac = pos/(pos+neg+1e-6); zero border ring.  With `sample_cap`, a
        stride-sampled subset estimates the fraction (training speed knob —
        the codec always passes None).

        With `axis_name` (inside shard_map) the gather+cumsum over the coord
        rows — the expensive, formerly mesh-replicated part (VERDICT r3 weak
        #5) — is split into contiguous per-device row chunks whose partial
        per-bin histograms psum to the total; the bin-boundary maps are pure
        ALU on iotas and stay replicated.  Partial-sum addition reorders f32
        adds vs the single cumsum, so float training bits can differ at
        rounding level across device counts; the codec path (sample_cap=None,
        axis_name=None, integer twin codec/intctx.py) is untouched.
        """
        scale = self.pn_res - 2
        f = self.cfg.n_features
        eidx = pn_ax["entry_idx"]
        bounds = pn_ax["bounds"]
        n = pn_ax["n"]
        cap = eidx.shape[0]

        def _sliced(rows, row_valid, bnd, gather_rows):
            """Per-bin sums of the gathered indicator rows; device-sliced
            over `axis_name` when set.  rows: static row count; row_valid:
            [rows] bool; bnd: [bins+1] boundary positions into the row space;
            gather_rows(lo, size) -> entry indices [size]."""
            if axis_name is None:
                sel = gather_rows(0, rows)
                svals = _pos_indicator(table3d_q[self.fine_offset + sel])
                svals = jnp.where(row_valid[:, None], svals, 0.0)
                return _csum_diffs(svals, bnd)
            nd = jax.lax.axis_size(axis_name)
            chunk = -(-rows // nd)
            lo = jax.lax.axis_index(axis_name) * chunk
            sel = gather_rows(lo, chunk)
            v_l = jax.lax.dynamic_slice(
                jnp.pad(row_valid, (0, chunk * nd - rows)), (lo,), (chunk,))
            svals = _pos_indicator(table3d_q[self.fine_offset + sel])
            svals = jnp.where(v_l[:, None], svals, 0.0)
            bnd_l = jnp.clip(bnd - lo, 0, chunk)
            return jax.lax.psum(_csum_diffs(svals, bnd_l), axis_name)

        if sample_cap is not None and sample_cap < cap:
            m = jnp.minimum(n, cap)
            take = jnp.minimum(m, sample_cap)
            # stride sample j -> floor(j*m/take) in float32 (int products
            # would overflow int32); the bin boundary map is derived from the
            # same j->src formula via searchsorted, so sampling stays
            # self-consistent
            stride = m.astype(jnp.float32) / jnp.maximum(take, 1).astype(
                jnp.float32)

            def src_of(j):
                s = jnp.floor(j.astype(jnp.float32) * stride).astype(jnp.int32)
                return jnp.minimum(s, jnp.maximum(m - 1, 0))

            j = jnp.arange(sample_cap, dtype=jnp.int32)
            bmap = jnp.searchsorted(src_of(j), bounds).astype(jnp.int32)
            bmap = jnp.minimum(bmap, take)
            pos = _sliced(
                sample_cap, j < take, bmap,
                lambda lo, size: eidx[jnp.minimum(
                    src_of(lo + jnp.arange(size, dtype=jnp.int32)), cap - 1)])
            cnt = (bmap[1:] - bmap[:-1]).astype(jnp.float32)[:, None]
        else:
            def gather_rows(lo, size):
                if size == cap:
                    return eidx
                pad = size * jax.lax.axis_size(axis_name) - cap
                return jax.lax.dynamic_slice(jnp.pad(eidx, (0, pad)),
                                             (lo,), (size,))

            pos = _sliced(cap, jnp.arange(cap) < jnp.minimum(n, cap), bounds,
                          gather_rows)
            cnt = (bounds[1:] - bounds[:-1]).astype(jnp.float32)[:, None]
        frac = pos / (cnt + 1e-6)
        plane = frac.reshape(scale, scale, f)
        plane = jnp.pad(plane, ((1, 1), (1, 1), (0, 0)))
        # x-fastest flat layout to match dense grid indexing (see
        # ops/encoding.grid_encode_given_table docstring)
        return plane.transpose(1, 0, 2).reshape(-1, f)

    # --------------------------------------------------- 3D training window
    def _slice_3d_windows(self, key, tbls):
        """Random per-level entry windows -> concatenated padded vertex batch.

        Per-level slices live in the concatenated buffers at the static
        v_off/e_off/c_off offsets (cum values are level-local vertex
        positions)."""
        parts = []
        a = tbls["3d"]
        for l in self.ctx_levels_3d:
            t = self.tables3d[l]
            u = jax.random.uniform(jax.random.fold_in(key, l))
            start_e = jnp.round((t.n_entries - t.sample_n) * u).astype(jnp.int32)
            start_v = a["cum"][t.c_off + start_e]
            end_v = a["cum"][t.c_off + start_e + t.sample_n]
            (pos, ve), vvalid = _window_slices(
                a, ("pos_flat", "vert_entry"), t.v_off, start_v, end_v,
                t.max_win_pts, t.n_vertices)
            evals = jax.lax.dynamic_slice(a["entry_values"],
                                          (t.e_off + start_e,), (t.sample_n,))
            parts.append(dict(level=l, pos=pos, slot=ve - start_e,
                              valid=vvalid, start_e=start_e,
                              entry_values=evals))
        return parts

    @property
    def total_param_count(self) -> int:
        """Static count behind bits-per-param (3 planes + 3D grid)."""
        f = self.cfg.n_features
        return (3 * self.spec2.total_entries + self.spec3.total_entries) * f

    def rate_bits_2d(self, ent_params, tables: Dict[str, jnp.ndarray],
                     key, cache: Dict, tbls: Optional[Dict] = None,
                     axis_name: Optional[str] = None):
        """Total estimated bits of the three tri-plane tables (differentiable).

        Separable from the 3D half so the trainer can jit each independently
        — the combined gradient program exceeds what the TPU compiler
        tolerates at flagship scale.  Inside jit, pass tbls=self.table_arrays
        as a traced argument (closure capture costs ~7 s/MB of lowering on
        the tunneled backend).  `axis_name` (inside shard_map) shards the
        frac-plane build across the mesh (pn_frac_plane).
        """
        cfg = self.cfg
        tbls = self.table_arrays if tbls is None else tbls
        ttl_bits = 0.0
        fine_table = tables["xyz"]
        for ai, ax in enumerate(("xy", "xz", "yz")):
            tbl2 = tables[ax]
            if cfg.use_dimension_wise:
                frac_plane = self.pn_frac_plane(
                    fine_table, cache["pn"][ax],
                    sample_cap=cfg.pn_frac_sample_cap,
                    axis_name=axis_name)
                if not cfg.pn_frac_grad:
                    frac_plane = jax.lax.stop_gradient(frac_plane)
            else:
                frac_plane = None
            for l in range(self.spec2.n_levels):
                level_slice = jax.lax.dynamic_slice_in_dim(
                    tbl2, self.spec2.offsets[l],
                    self.spec2.level_sizes[l])
                pg_n, bits_n, _ = ent_ops.global_pg_bits(level_slice)
                if l in self.ctx_levels_2d:
                    bits_n = self._bits_2d_level(
                        ent_params, tbl2, l, pg_n, frac_plane,
                        cache["bin2d"][ai], cache["mask2d"][ai],
                        jax.random.fold_in(key, 100 + 10 * ai + l), tbls)
                ttl_bits = ttl_bits + bits_n
        return ttl_bits

    def rate_bits_3d(self, ent_params, tbl3: jnp.ndarray, key, cache: Dict,
                     tbls: Optional[Dict] = None, with_util: bool = False):
        """Total estimated bits of the 3D grid table (differentiable).

        Inside jit, pass tbls=self.table_arrays (see rate_bits_2d).  With
        `with_util`, also returns the ctx-vertex budget utilization
        (masked vertices / v_ctx_cap; > 1 means drops)."""
        tbls = self.table_arrays if tbls is None else tbls
        ttl_bits = 0.0
        pg_by_level = {}
        for l in range(self.spec3.n_levels):
            level_slice = jax.lax.dynamic_slice_in_dim(
                tbl3, self.spec3.offsets[l], self.spec3.level_sizes[l])
            pg_n, bits_n, _ = ent_ops.global_pg_bits(level_slice)
            pg_by_level[l] = pg_n
            if l in self.cfg.skip_levels_3d or l >= self.pg_level:
                ttl_bits = ttl_bits + bits_n
        sampled, util = self._bits_3d_sampled(
            ent_params, tbl3, pg_by_level, cache, key, tbls)
        ttl_bits = ttl_bits + sampled
        return (ttl_bits, util) if with_util else ttl_bits

    def rate_estimate(self, ent_params, tables: Dict[str, jnp.ndarray],
                      binaries: jnp.ndarray, key, cache: Dict,
                      tbls: Optional[Dict] = None,
                      axis_name: Optional[str] = None):
        """Training-time bits-per-param (forward_binary_vxl_mixPg_3D2D).

        tables: dict of binarized (+-1) tables {'xyz','xy','xz','yz'}.
        Returns (bits_per_param, estimated MB).  Differentiable in both
        ent_params and tables.  `axis_name` (inside shard_map) shards the
        2D frac-plane build across the mesh.
        """
        ttl_bits = (self.rate_bits_2d(ent_params, tables, key, cache, tbls,
                                      axis_name=axis_name)
                    + self.rate_bits_3d(ent_params, tables["xyz"], key, cache,
                                        tbls))
        bpp = ttl_bits / self.total_param_count
        return bpp, ttl_bits / 8.0 / 1024.0 / 1024.0

    # ------------------------------------------------------- 2D level pooling
    def pool_2d_level(self, ent_params, tbl2, level, pg_n, frac_plane,
                      bin2d, mask2d, start_e, n_e, w,
                      tbls: Optional[Dict] = None):
        """Per-entry pooled context probabilities for one 2D level window.

        Returns (pooled [n_e,F], covered [n_e], values_q [n_e,F]).
        Shared by the training rate estimate (sampled window) and the codec
        (full coverage: start_e=0, n_e=n_entries, w=n_points).
        """
        cfg = self.cfg
        t = self.tables2d[level]
        a = (self.table_arrays if tbls is None else tbls)["2d"]
        start_v = a["cum"][t.c_off + start_e]
        end_v = a["cum"][t.c_off + start_e + n_e]
        (coords, slots), valid = _window_slices(
            a, ("coords", "vert_entry"), t.v_off, start_v, end_v,
            w, t.n_points)
        slots = slots - start_e
        evals = jax.lax.dynamic_slice(a["entry_values"], (t.e_off + start_e,),
                                      (n_e,))

        xi = (coords >> 16).astype(jnp.int32)
        yi = (coords & 0xFFFF).astype(jnp.int32)
        # per-corner FOOTPRINT mask, matching pool_2d_level_int: the codec
        # covers every corner whose footprint box touches occupancy (a strict
        # superset of block occupancy near boundaries), so the training rate
        # must bill the same set or it under-counts the coded entries
        # (VERDICT r3 weak #2; reference pools block-occupied corners,
        # utils_bpp_acc.py:535-574, but its coder reuses in-memory floats so
        # it never faces the coverage-sync constraint)
        occ_block = mask2d[self.mask2d_offsets[level]
                           + xi * t.resolution + yi] & valid
        x = xi.astype(jnp.float32)
        y = yi.astype(jnp.float32)
        pts = jnp.stack([(x - 0.5), (y - 0.5)], -1) / (t.resolution - 2.0)

        cln = min(level, cfg.max_context_layer_num)
        # ctx_grad=False: the coarser-level context lookups become constants
        # of the rate graph (their scatter-heavy backward is skipped); the
        # coded entries keep their direct bernoulli-bits gradient below
        ctx_src = tbl2 if cfg.ctx_grad else jax.lax.stop_gradient(tbl2)
        slots = jnp.clip(slots, 0, n_e - 1)
        cap = cfg.v_ctx_cap_2d
        if cap is not None and cap < w:
            # compact the footprint-masked rows to a static context budget
            # (the 2D twin of _bits_3d_sampled's v_ctx_cap): only masked
            # rows enter the pooling below, so encoding ONLY them is exact
            # whenever the budget holds all of them; beyond-budget rows are
            # dropped from the pooling entirely (their zero means must not
            # dilute the per-entry probabilities), like the 3D path.
            # Training-only — the codec's integer twin (pool_2d_level_int)
            # is always full-coverage.
            src, total = scatter_ops.compact_mask_indices(occ_block, cap)
            cvalid = jnp.arange(cap) < jnp.minimum(total, cap)
            pts_c = pts[src]
            ctx = enc.grid_encode(pts_c, ctx_src, self.spec2,
                                  level - cln, level, occ_mask=mask2d,
                                  mask_offsets=self.mask2d_offsets)
            feats = [ctx]
            if frac_plane is not None:
                feats.append(enc.grid_encode_given_table(
                    pts_c, frac_plane, self.pn_res, occ_mask=mask2d,
                    mask_offset=self.pn_mask_offset))
            feats.append(jnp.broadcast_to(pg_n[None, None], (cap, 1)))
            mean = self.apply_ctx2d(ent_params["ctx2d"], level,
                                    jnp.concatenate(feats, -1))
            # pool in the compacted layout: src ascends, so slots[src] stays
            # sorted-contiguous per entry (see the 3D pooling note)
            cslot = slots[src]
            cnt = _segment_tail_values(cvalid.astype(jnp.float32), cslot,
                                       cvalid, n_e)
            msum = _segment_tail_values(mean, cslot, cvalid, n_e)
        else:
            ctx = enc.grid_encode(pts, ctx_src, self.spec2, level - cln,
                                  level, occ_mask=mask2d,
                                  mask_offsets=self.mask2d_offsets)
            feats = [ctx]
            if frac_plane is not None:
                ctx_pn = enc.grid_encode_given_table(
                    pts, frac_plane, self.pn_res, occ_mask=mask2d,
                    mask_offset=self.pn_mask_offset)
                feats.append(ctx_pn)
            feats.append(jnp.broadcast_to(pg_n[None, None], (w, 1)))
            mean = self.apply_ctx2d(ent_params["ctx2d"], level,
                                    jnp.concatenate(feats, -1))
            cnt = _segment_tail_values(occ_block.astype(jnp.float32), slots,
                                       jnp.ones_like(occ_block), n_e)
            msum = _segment_tail_values(mean, slots, occ_block, n_e)
        pooled = msum / jnp.maximum(cnt, 1.0)[:, None]
        covered = cnt > 0
        values_q = tbl2[t.offset + evals]
        return pooled, covered, values_q

    def _bits_2d_level(self, ent_params, tbl2, level, pg_n, frac_plane,
                       bin2d, mask2d, key, tbls):
        """Context-model bits of one 2D level over a sampled entry window."""
        t = self.tables2d[level]
        u = jax.random.uniform(key)
        start_e = jnp.round((t.n_entries - t.sample_n) * u).astype(jnp.int32)
        pooled, covered, values_q = self.pool_2d_level(
            ent_params, tbl2, level, pg_n, frac_plane, bin2d, mask2d,
            start_e, t.sample_n, t.max_win_pts, tbls)
        bits = ent_ops.bernoulli_bits(values_q, pooled)
        bits = jnp.sum(jnp.where(covered[:, None], bits, 0.0))
        # extrapolate sampled window to the whole level (TPU adaptation;
        # exact when sample_num_2d is None => window == full level)
        return bits * (t.n_entries / t.sample_n)

    # ------------------------------------------------------- 3D level pooling
    def pool_3d_level(self, ent_params, tbl3, cache, level, pg_n, start_e,
                      n_e, w, tbls: Optional[Dict] = None):
        """Per-entry pooled context probabilities for one 3D level window.

        Static level (context = levels [level-k, level)); used by the codec's
        chunked full-coverage passes (encode_binary_vxl chunking,
        utils_bpp_acc.py:798-858).  Returns (pooled, covered, values_q).
        """
        cfg = self.cfg
        f = cfg.n_features
        t = self.tables3d[level]
        a = (self.table_arrays if tbls is None else tbls)["3d"]
        r = t.resolution
        start_v = a["cum"][t.c_off + start_e]
        end_v = a["cum"][t.c_off + start_e + n_e]
        (pos, slots), valid = _window_slices(
            a, ("pos_flat", "vert_entry"), t.v_off, start_v, end_v, w,
            t.n_vertices)
        slots = slots - start_e
        evals = jax.lax.dynamic_slice(a["entry_values"], (t.e_off + start_e,),
                                      (n_e,))

        mask = cache["mask3d"][self.mask3d_offsets[level] + pos] & valid
        ovl = cache["ovl"][str(level)][pos]
        ovl_w = jnp.maximum(jnp.floor(ovl * 1000.0), 1.0)

        xx = pos // (r * r)
        yy = (pos // r) % r
        zz = pos % r
        pts = (jnp.stack([xx, yy, zz], -1).astype(jnp.float32) - 0.5) / (r - 2.0)
        k = cfg.max_context_layer_num
        ctx = enc.grid_encode(pts, tbl3, self.spec3, level - k, level,
                              occ_mask=cache["mask3d"],
                              mask_offsets=self.mask3d_offsets)
        ctx = jnp.concatenate(
            [ctx, jnp.broadcast_to(pg_n[None, None], (w, 1))], -1)
        mean = self.apply_ctx3d(ent_params["ctx3d"], ctx)

        slots = jnp.clip(slots, 0, n_e - 1)
        wgt = jnp.where(mask, ovl_w, 0.0)
        wsum = _segment_tail_values(wgt, slots, valid, n_e)
        if cfg.use_overlap_area_pool:
            pooled = _segment_tail_values(mean * wgt[:, None], slots, valid,
                                          n_e)
            pooled = pooled / jnp.maximum(wsum, 1e-9)[:, None]
        else:
            mcnt = _segment_tail_values(mask.astype(jnp.float32), slots,
                                        valid, n_e)
            pooled = _segment_tail_values(mean, slots, mask, n_e)
            pooled = pooled / jnp.maximum(mcnt, 1.0)[:, None]
        covered = wsum > 0
        values_q = tbl3[t.offset + evals]
        return pooled, covered, values_q

    # --------------------------------------- deterministic int codec path
    # Integer twins of refresh_cache / pool_3d_level / pool_2d_level /
    # pn_frac_plane used by the codec (codec/intctx.py docstring): every
    # arithmetic step is exact int32, so encode and decode compute
    # bit-identical probabilities in ANY process on ANY backend — the
    # property the self-contained bundle needs and the reference never had
    # (it reuses one process's in-memory probabilities, utils_bpp_acc.py:
    # 81-110).
    def refresh_cache_int(self, binaries: jnp.ndarray) -> Dict:
        self._check_binaries(binaries)
        fn = getattr(self, "_refresh_int_jit", None)
        if fn is None:
            fn = jax.jit(self._refresh_codec_impl)
            self._refresh_int_jit = fn
        return fn(binaries)

    def _refresh_codec_impl(self, binaries):
        from ..codec import intctx

        cache = {}
        bin2d = jnp.stack([jnp.any(binaries, axis=2),
                           jnp.any(binaries, axis=1),
                           jnp.any(binaries, axis=0)])
        cache["bin2d"] = bin2d
        rb = self.rb
        m3 = []
        cache["ovl_int"] = {}
        for l in range(self.spec3.n_levels):
            r = self.spec3.resolutions[l]
            m3.append(_dense_mask_grid(binaries, r, rb).reshape(-1))
            if l in self.ctx_levels_3d:
                cache["ovl_int"][str(l)] = intctx.int_overlap_grid(
                    binaries, r, rb)
        cache["mask3d"] = jnp.concatenate(m3)
        m2 = []
        for ai in range(3):
            m2.append(jnp.concatenate(
                [_dense_mask_grid(bin2d[ai], r, rb).reshape(-1)
                 for r in self.mask2d_resolutions]))
        cache["mask2d"] = jnp.stack(m2)
        cache["pn"] = self._refresh_pn_coords(binaries)
        return cache

    def _ctx_levels_meta(self, spec, mask_offsets, lo: int, hi: int):
        return [(spec.resolutions[lc], spec.offsets[lc],
                 spec.offsets[lc + 1] - spec.offsets[lc], mask_offsets[lc])
                for lc in range(lo, hi)]

    def pool_3d_level_int(self, int_params, sign3, cache_i, level, pg_q,
                          start_e, n_e, w, m_shift,
                          tbls: Optional[Dict] = None):
        """Integer pool_3d_level: returns (msum [n_e,F] int32, wsum [n_e]
        int32, covered, values [n_e,F] int32 +-1); the caller derives the
        uint16 coder probability as floor(msum*65536 / (wsum*m_scale))."""
        from ..codec import intctx

        cfg = self.cfg
        t = self.tables3d[level]
        a = (self.table_arrays if tbls is None else tbls)["3d"]
        r = t.resolution
        start_v = a["cum"][t.c_off + start_e]
        end_v = a["cum"][t.c_off + start_e + n_e]
        (pos, slots), valid = _window_slices(
            a, ("pos_flat", "vert_entry"), t.v_off, start_v, end_v, w,
            t.n_vertices)
        slots = slots - start_e
        evals = jax.lax.dynamic_slice(a["entry_values"], (t.e_off + start_e,),
                                      (n_e,))
        mask = cache_i["mask3d"][self.mask3d_offsets[level] + pos] & valid
        coords = jnp.stack([pos // (r * r), (pos // r) % r, pos % r],
                           -1).astype(jnp.int32)
        k = cfg.max_context_layer_num
        levels = self._ctx_levels_meta(self.spec3, self.mask3d_offsets,
                                       level - k, level)
        feats = intctx.int_encode_levels(coords, r, sign3, levels,
                                         cache_i["mask3d"])
        x = jnp.concatenate(
            [feats, jnp.broadcast_to(pg_q[None, None], (w, 1))], -1)
        mean = intctx.int_apply_ctx3d(int_params["ctx3d"], x)
        mean = mean // (1 << m_shift)
        slots = jnp.clip(slots, 0, n_e - 1)
        if cfg.use_overlap_area_pool:
            ovl_w = cache_i["ovl_int"][str(level)][pos]
            wgt = jnp.where(mask, jnp.maximum(ovl_w, 1), 0)
        else:
            wgt = jnp.where(mask, 1, 0)
        msum = intctx.segment_sum_int(mean * wgt[:, None], slots, valid, n_e)
        wsum = intctx.segment_sum_int(wgt, slots, valid, n_e)
        covered = wsum > 0
        values = jnp.take(sign3, t.offset + evals, axis=0)
        return msum, wsum, covered, values

    def pool_2d_level_int(self, int_params, sign2, level, pg_q, plane_q,
                          mask2d_ax, start_e, n_e, w, m_shift,
                          tbls: Optional[Dict] = None):
        """Integer pool_2d_level (full coverage).

        Coverage/pooling uses the PER-CORNER footprint mask (mask2d), not
        the float twin's block occupancy: the context gathers of finer
        levels treat a corner as valid whenever mask2d[corner] is true, so
        every such corner's entry MUST be in the bitstream or decode reads
        an un-decoded (+1) entry where encode read the trained sign and the
        coder desyncs.  mask2d[c] => entry(c) covered holds by construction
        here (same grid on both sides), mirroring the 3D path's mask3d
        invariant.  plane_q: int dimension-wise prior plane or None.
        """
        from ..codec import intctx

        cfg = self.cfg
        t = self.tables2d[level]
        a = (self.table_arrays if tbls is None else tbls)["2d"]
        start_v = a["cum"][t.c_off + start_e]
        end_v = a["cum"][t.c_off + start_e + n_e]
        (coords, slots), valid = _window_slices(
            a, ("coords", "vert_entry"), t.v_off, start_v, end_v, w,
            t.n_points)
        slots = slots - start_e
        evals = jax.lax.dynamic_slice(a["entry_values"], (t.e_off + start_e,),
                                      (n_e,))
        x = coords >> 16
        y = coords & 0xFFFF
        mask_v = mask2d_ax[self.mask2d_offsets[level]
                           + x * t.resolution + y] & valid
        cint = jnp.stack([x, y], -1).astype(jnp.int32)
        cln = min(level, cfg.max_context_layer_num)
        levels = self._ctx_levels_meta(self.spec2, self.mask2d_offsets,
                                       level - cln, level)
        feats = intctx.int_encode_levels(cint, t.resolution, sign2, levels,
                                         mask2d_ax)
        parts = [feats]
        if plane_q is not None:
            parts.append(intctx.int_encode_plane(
                cint, t.resolution, plane_q, self.pn_res, mask2d_ax,
                self.pn_mask_offset))
        parts.append(jnp.broadcast_to(pg_q[None, None], (w, 1)))
        mean = intctx.int_apply_ctx2d(int_params["ctx2d"], level,
                                      jnp.concatenate(parts, -1))
        mean = mean // (1 << m_shift)
        slots = jnp.clip(slots, 0, n_e - 1)
        cnt = intctx.segment_sum_int(mask_v.astype(jnp.int32), slots,
                                     jnp.ones_like(mask_v), n_e)
        msum = intctx.segment_sum_int(mean, slots, mask_v, n_e)
        covered = cnt > 0
        values = jnp.take(sign2, t.offset + evals, axis=0)
        return msum, cnt, covered, values

    def frac_plane_int(self, sign3: jnp.ndarray, pn_ax: Dict) -> jnp.ndarray:
        from ..codec import intctx

        return intctx.int_frac_plane(sign3, pn_ax, self.fine_offset,
                                     self.pn_res, self.cfg.n_features)

    # ------------------------------------------------------- 3D level bits
    def _bits_3d_sampled(self, ent_params, tbl3, pg_by_level, cache, key,
                         tbls):
        cfg = self.cfg
        f = cfg.n_features
        parts = self._slice_3d_windows(jax.random.fold_in(key, 7), tbls)
        if not parts:
            return 0.0, 0.0
        # concat vertex windows (static total size)
        pos = jnp.concatenate([p["pos"] for p in parts])
        valid = jnp.concatenate([p["valid"] for p in parts])
        levels = jnp.concatenate([
            jnp.full((p["pos"].shape[0],), p["level"], jnp.int32)
            for p in parts])
        base = 0
        slots = []
        for p in parts:
            slots.append(p["slot"] + base)
            base += self.tables3d[p["level"]].sample_n
        slot = jnp.concatenate(slots)
        e_total = base

        # occupancy mask + overlap from dense cached grids (1 gather each)
        mask = jnp.zeros_like(valid)
        ovl = jnp.zeros(pos.shape, jnp.float32)
        off = 0
        for p in parts:
            l = p["level"]
            n = p["pos"].shape[0]
            seg = slice(off, off + n)
            m_l = cache["mask3d"][self.mask3d_offsets[l] + pos[seg]]
            mask = mask.at[seg].set(m_l & valid[seg])
            ovl = ovl.at[seg].set(cache["ovl"][str(l)][pos[seg]])
            off += n
        # int(x*1000) clamp(min=1) like the reference pooling weights
        ovl_w = jnp.maximum(jnp.floor(ovl * 1000.0), 1.0)

        # compact masked vertices to the context budget (scatter-free);
        # vertices beyond the budget are dropped from the pooling entirely
        # (their zero means must not dilute the per-entry probabilities)
        cap = cfg.v_ctx_cap
        src, total = scatter_ops.compact_mask_indices(mask, cap)
        cvalid = jnp.arange(cap) < jnp.minimum(total, cap)
        # static-budget utilization (ROOFLINE lever #2: the ctx encode cost
        # scales with cap, not with the masked count — measure before
        # shrinking); > 1 means vertices were DROPPED from the pooling
        ctx_util = total.astype(jnp.float32) / cap

        clev = levels[src]
        cpos = pos[src]
        res_arr = jnp.asarray(self.spec3.resolutions, jnp.int32)[clev]
        xx = cpos // (res_arr * res_arr)
        yy = (cpos // res_arr) % res_arr
        zz = cpos % res_arr
        pts = (jnp.stack([xx, yy, zz], -1).astype(jnp.float32) - 0.5) / \
            (res_arr.astype(jnp.float32) - 2.0)[:, None]
        k = cfg.max_context_layer_num
        # see pool_2d_level: ctx_grad=False skips the context-gather backward
        ctx_src = tbl3 if cfg.ctx_grad else jax.lax.stop_gradient(tbl3)
        ctx = enc.grid_encode_diff_levels(pts, ctx_src, self.spec3,
                                          clev - k, k,
                                          occ_mask=cache["mask3d"],
                                          mask_offsets=self.mask3d_offsets)
        pg_arr = jnp.stack([pg_by_level[l] for l in range(self.spec3.n_levels)])
        ctx = jnp.concatenate([ctx, pg_arr[clev][:, None]], -1)
        mean = self.apply_ctx3d(ent_params["ctx3d"], ctx)

        # pool directly in the COMPACTED layout: src enumerates exactly the
        # kept (masked, in-budget) vertices in ascending window order, so
        # slot[src] stays sorted-contiguous per entry and the segment sums
        # over [cap] rows equal the old window-layout sums over [sum of
        # max_win_pts] rows (~3x more) that also needed a [cap]-row
        # set-scatter to rebuild mean_full first.  Exactness: old
        # w = (mask & c<=cap) * ovl_w is nonzero exactly at the compacted
        # positions, where it equals cw below (r4 perf pass).
        cslot = slot[src]
        cw = jnp.where(cvalid, ovl_w[src], 0.0)
        wsum = _segment_tail_values(cw, cslot, cvalid, e_total)
        if cfg.use_overlap_area_pool:
            pooled = _segment_tail_values(mean * cw[:, None], cslot, cvalid,
                                          e_total)
            pooled = pooled / jnp.maximum(wsum, 1e-9)[:, None]
        else:
            mcnt = _segment_tail_values(cvalid.astype(jnp.float32), cslot,
                                        cvalid, e_total)
            pooled = _segment_tail_values(mean, cslot, cvalid, e_total)
            pooled = pooled / jnp.maximum(mcnt, 1.0)[:, None]
        exist = wsum > 0

        evals = jnp.concatenate([
            p["entry_values"] + self.tables3d[p["level"]].offset
            for p in parts])
        values_q = tbl3[evals]
        bits = ent_ops.bernoulli_bits(values_q, pooled)
        bits = jnp.sum(jnp.where(exist[:, None], bits, 0.0))
        # extrapolation (utils_bpp_acc.py:700)
        return (bits / self.ttl_sample_valid_3d * self.ttl_entries_valid_3d,
                ctx_util)


def _csum_diffs(svals: jnp.ndarray, bounds: jnp.ndarray) -> jnp.ndarray:
    """Per-bin sums of svals [N, F] over boundary positions: column-wise 1-D
    cumsums instead of one [N, F] cumsum (a 2-D op with a tiny minor dim pads
    to 128 lanes — ~30x the memory traffic)."""
    f = svals.shape[1]
    cols = []
    for fi in range(f):
        cs = jnp.concatenate([jnp.zeros((1,), svals.dtype),
                              jnp.cumsum(svals[:, fi])])
        cols.append(cs[bounds[1:]] - cs[bounds[:-1]])
    return jnp.stack(cols, axis=-1)


def _dense_mask_grid(occ: jnp.ndarray, resolution: int, rb: int) -> jnp.ndarray:
    """Dense per-corner occupancy mask for one level, any dimensionality.

    mask[c] == "any occupied cell overlaps the corner footprint box" — the
    encoder's binary_vxl corner test (gridencoder.cu:222-276) as D separable
    1-D box-count pools over the occupancy grid (same bounds as
    _dense_mask_overlap_grids below).
    """
    r = resolution
    c = np.arange(r, dtype=np.float64)
    scale_re = 1.0 / (r - 2.0)
    pn = (c - 0.5) * scale_re
    lo = np.clip((pn - scale_re) * rb, 0, rb - 1).astype(np.int32)
    hi = np.clip((pn + scale_re) * rb, 0, rb - 1).astype(np.int32)

    # always pool along axis 0 and roll it to the back: a take along the
    # minor axis lowers to per-ELEMENT gathers (~7 ns x r^D), while axis-0
    # takes are contiguous slice gathers; the interleaved transposes are
    # bandwidth-cheap relayouts.  After ndim rounds the axis order is back
    # to the original.
    def pool_any0(x):
        s = jnp.cumsum(x, axis=0)
        s = jnp.concatenate([jnp.zeros_like(s[:1]), s], axis=0)
        return s[hi + 1] - s[lo]

    m = occ.astype(jnp.int32)
    for _ in range(occ.ndim):
        m = jnp.moveaxis(pool_any0(m), 0, -1)
    return m > 0


def _dense_mask_overlap_grids(binaries: jnp.ndarray, resolution: int,
                              rb: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense per-corner occupancy mask + overlap volume grids for one level.

    Separable reformulation of query_mask_3D (aligner_kernel.cu:162-242): the
    footprint box bounds per axis depend only on that axis' corner coordinate,
    so 'any occupied in box' and the fractional overlap integral factor into
    three sequential 1D pools over the occupancy grid, each a static gather
    of per-axis cumulative sums.  Exactness matches ops/sat.py's per-point
    queries (cross-checked in tests).
    """
    r = resolution
    c = np.arange(r, dtype=np.float64)
    scale_re = 1.0 / (r - 2.0)
    pn = (c - 0.5) * scale_re
    lo = np.clip((pn - scale_re) * rb, 0, rb - 1).astype(np.int32)
    hi = np.clip((pn + scale_re) * rb, 0, rb - 1).astype(np.int32)
    a_f = np.clip(pn - scale_re, 0.0, 1.0) * rb       # continuous, cell units
    b_f = np.clip(pn + scale_re, 0.0, 1.0) * rb

    # axis-0 pools with axis rolling — see _dense_mask_grid for why
    def pool_any0(x):
        s = jnp.cumsum(x, axis=0)
        s = jnp.concatenate([jnp.zeros_like(s[:1]), s], axis=0)
        return s[hi + 1] - s[lo]

    def pool_frac0(x):
        # fractional integral over [a_f, b_f] of piecewise-constant x
        s = jnp.cumsum(x, axis=0)
        s = jnp.concatenate([jnp.zeros_like(s[:1]), s], axis=0)

        def lerp(u):
            i0 = np.clip(np.floor(u).astype(np.int32), 0, rb - 1)
            frac = (u - i0).astype(np.float32)
            fr = jnp.asarray(frac).reshape((r,) + (1,) * (x.ndim - 1))
            return s[i0] * (1.0 - fr) + s[i0 + 1] * fr

        return lerp(b_f) - lerp(a_f)

    m = binaries.astype(jnp.int32)
    o = binaries.astype(jnp.float32)
    for _ in range(3):
        m = jnp.moveaxis(pool_any0(m), 0, -1)
        o = jnp.moveaxis(pool_frac0(o), 0, -1)
    return m > 0, o
