"""Deterministic integer context inference for the codec path.

The range coder desyncs if encode and decode disagree on a single quantized
probability.  The float context pipeline (grid-interp gathers -> context MLP
-> overlap-weighted pooling, models/context_models.py) is bit-reproducible
only while both sides run the *same compiled executables* — the reference
sidesteps the problem by keeping one process's probabilities in memory for
both passes (utils_bpp_acc.py:81-110, :956), which is why its bitstreams are
not self-contained.  A self-contained bundle must recompute probabilities in
an arbitrary fresh process, so this module re-expresses the whole codec-side
probability computation in int32:

  * interpolation weights from exact integer divmod on lattice coordinates
    (per-axis 5-bit fixed point),
  * the context MLPs in fixed point (weights rounded once on the host with
    float64 `rint`, activations at 1/256 steps, LeakyReLU as an integer
    multiply/shift),
  * overlap-area pooling weights from integer summed-area pools,
  * per-entry pooling with int32 scatter-adds,
  * the final uint16 coder probability via one int64 host division.

Integer add/mul/div/gather/scatter are exact, and integer addition is
associative, so ANY backend, fusion choice, or reduction order produces
bit-identical probabilities — encode on TPU, decode on CPU, years later.
Numerically the fixed-point model tracks the float model to ~1%, costing a
fraction of a percent of rate (the coder itself always quantized p to 16
bits); losslessness is unaffected because both sides use this path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hash_ops

# EVERY constant and arithmetic step below is bitstream-format-defining:
# changing any of them desyncs decode of existing bundles (the per-stream
# checksums catch it loudly).  Bump FORMAT_VERSION on any change.
FORMAT_VERSION = 3

# fixed-point scales (see module docstring for the int32 overflow budget;
# the per-level pooling shift in CNCCodec handles pathological hash buckets)
Q_AXIS = 32            # per-axis interp weight quantization (5 bits)
Q_FEAT = 256           # feature scale: 1.0 == 256
Q_W = 512              # MLP weight scale
H_CLIP = 1 << 12       # hidden activation clip (+-16.0 at Q_FEAT)
M_SHIFT = 6            # acc3 (scale Q_FEAT*Q_W) >> 6 -> output scale 2**11
M_SCALE = Q_FEAT * Q_W >> M_SHIFT   # == 2048
M_CLIP = 1 << 14       # output clip (+-8.0 at M_SCALE)
W_MAX = 7.9            # quantizable MLP |weight| bound (keeps acc < 2**30)
OVL_BITS = 6           # overlap pooling weights in [1, 63]


# ------------------------------------------------------------ param quant
def quantize_ctx_params(ent_params) -> Dict:
    """Fixed-point context-MLP weights, rounded ONCE on the host.

    np.rint on float64 is a single correctly-rounded IEEE op per element, so
    any machine derives the identical integer weights from the float32
    ent_params stored in the bundle — the bundle format is unchanged.
    """
    def q(leaf, scale):
        a = np.asarray(leaf, np.float64)
        m = float(np.max(np.abs(a))) if a.size else 0.0
        if m > W_MAX:
            raise ValueError(
                f"context-MLP weight magnitude {m:.2f} exceeds {W_MAX}; "
                "int codec path would overflow — retrain or rescale")
        return np.rint(a * scale).astype(np.int32)

    out = {"ctx3d": {}, "ctx2d": {}}
    for lname, lin in ent_params["ctx3d"].items():
        out["ctx3d"][lname] = {"w": q(lin["w"], Q_W),
                               "b": q(lin["b"], Q_FEAT * Q_W)}
    for lvl, lin in ent_params["ctx2d"].items():
        out["ctx2d"][str(lvl)] = {"w": q(lin["w"], Q_W),
                                  "b": q(lin["b"], Q_FEAT * Q_W)}
    return out


def quantize_pg(pg: float) -> int:
    """Global-probability feature at Q_FEAT (host float64 rint)."""
    return int(np.rint(np.float64(pg) * Q_FEAT))


def sign_table(tbl: jnp.ndarray) -> jnp.ndarray:
    """float (+-1) table -> int32 sign table (+1 where > 0)."""
    return jnp.where(tbl > 0, jnp.int32(1), jnp.int32(-1))


# ------------------------------------------------------------- int interp
def _axis_interp(c: jnp.ndarray, rf: int, rc: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact lattice->lattice interp: coord c on an rf-grid evaluated on an
    rc-grid.  x = ((2c-1)(rc-2) + (rf-2)) / (2(rf-2)); returns (floor(x),
    round(frac(x) * Q_AXIS)) as int32 — the integer mirror of
    ops/encoding._level_setup for points pts=(c-0.5)/(rf-2)."""
    den = 2 * (rf - 2)
    num = (2 * c - 1) * (rc - 2) + (rf - 2)
    pgc = num // den
    rem = num - pgc * den
    fq = (rem * Q_AXIS + den // 2) // den
    return pgc.astype(jnp.int32), fq.astype(jnp.int32)


def int_encode_levels(coords: jnp.ndarray, rf: int, sign_tbl: jnp.ndarray,
                      levels: Sequence[Tuple[int, int, int, int]],
                      occ_mask: jnp.ndarray) -> jnp.ndarray:
    """Integer context features for lattice vertices against coarser levels.

    Args:
      coords: [N, D] int32 lattice coords of the level being coded (res rf).
      sign_tbl: [total, F] int32 +-1 table (the already-(to-be-)decoded one).
      levels: per context level (rc, offset, hashmap_size, mask_offset).
      occ_mask: flat bool per-corner masks (cache['mask3d'] / ['mask2d'][ai]).
    Returns:
      [N, len(levels)*F + is-left-for-caller] — int32 features at Q_FEAT,
      level-major, zeroed at out-of-bounds vertices (coord 0 or rf-1 on any
      axis, mirroring ops/encoding._gather_levels' oob rule).
    """
    n, d = coords.shape
    f = sign_tbl.shape[-1]
    oob = jnp.zeros((n,), bool)
    for ax in range(d):
        oob = oob | (coords[:, ax] == 0) | (coords[:, ax] >= rf - 1)
    feats = []
    for (rc, offset, hs, moff) in levels:
        pgc_l, fq_l = [], []
        for ax in range(d):
            pgc, fq = _axis_interp(coords[:, ax], rf, rc)
            pgc_l.append(pgc)
            fq_l.append(fq)
        acc = jnp.zeros((n, f), jnp.int32)
        wsum = jnp.zeros((n,), jnp.int32)
        for corner in range(1 << d):
            cc = []
            w = jnp.full((n,), 1, jnp.int32)
            for ax in range(d):
                if (corner >> ax) & 1:
                    cc.append(jnp.minimum(pgc_l[ax] + 1, rc - 1))
                    w = w * fq_l[ax]
                else:
                    cc.append(pgc_l[ax])
                    w = w * (Q_AXIS - fq_l[ax])
            cc = jnp.stack(cc, -1)
            # pgc can be -1 at oob vertices (coord 0 when rc > rf); those
            # rows are zeroed below, but clamp so every gather index is
            # in-bounds by construction (no reliance on XLA oob semantics)
            cc = jnp.clip(cc, 0, rc - 1)
            valid = jnp.ones((n,), bool)
            for ax in range(d):
                valid = valid & (cc[:, ax] != 0) & (cc[:, ax] != rc - 1)
            flat = cc[:, 0]
            for ax in range(1, d):
                flat = flat * rc + cc[:, ax]
            valid = valid & occ_mask[moff + flat]
            idx = hash_ops.grid_index(cc, rc, hs)
            w = jnp.where(valid, w, 0)
            vals = jnp.take(sign_tbl, jnp.where(valid, idx + offset, 0),
                            axis=0, mode="clip")
            acc = acc + w[:, None] * vals
            wsum = wsum + w
        feat = jnp.where(wsum[:, None] > 0,
                         (acc * Q_FEAT) // jnp.maximum(wsum, 1)[:, None], 0)
        feats.append(jnp.where(oob[:, None], 0, feat))
    return jnp.concatenate(feats, axis=-1)


def int_encode_plane(coords: jnp.ndarray, rf: int, plane_q: jnp.ndarray,
                     pn_res: int, occ_mask: jnp.ndarray,
                     mask_offset: int) -> jnp.ndarray:
    """Integer bilinear lookup of a dense x-fastest plane (values at Q_FEAT)
    — the dimension-wise prior read (grid_encode_given_table docstring)."""
    n, _ = coords.shape
    f = plane_q.shape[-1]
    oob = jnp.zeros((n,), bool)
    for ax in range(2):
        oob = oob | (coords[:, ax] == 0) | (coords[:, ax] >= rf - 1)
    pgc_l, fq_l = zip(*(_axis_interp(coords[:, ax], rf, pn_res)
                        for ax in range(2)))
    acc = jnp.zeros((n, f), jnp.int32)
    wsum = jnp.zeros((n,), jnp.int32)
    for corner in range(4):
        cc, w = [], jnp.full((n,), 1, jnp.int32)
        for ax in range(2):
            if (corner >> ax) & 1:
                cc.append(jnp.minimum(pgc_l[ax] + 1, pn_res - 1))
                w = w * fq_l[ax]
            else:
                cc.append(pgc_l[ax])
                w = w * (Q_AXIS - fq_l[ax])
        cc = jnp.clip(jnp.stack(cc, -1), 0, pn_res - 1)
        valid = ((cc[:, 0] != 0) & (cc[:, 0] != pn_res - 1) &
                 (cc[:, 1] != 0) & (cc[:, 1] != pn_res - 1))
        flat_mask = cc[:, 0] * pn_res + cc[:, 1]
        valid = valid & occ_mask[mask_offset + flat_mask]
        # dense x-fastest table index (hash_ops.dense_index convention)
        idx = cc[:, 0] + cc[:, 1] * pn_res
        w = jnp.where(valid, w, 0)
        vals = jnp.take(plane_q, jnp.where(valid, idx, 0), axis=0,
                        mode="clip")
        acc = acc + w[:, None] * vals
        wsum = wsum + w
    feat = jnp.where(wsum[:, None] > 0,
                     acc // jnp.maximum(wsum, 1)[:, None], 0)
    return jnp.where(oob[:, None], 0, feat)


# ------------------------------------------------------------- int MLPs
def _int_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[N,K]@[K,M] in int32 via an unrolled K loop (guaranteed lowering +
    exact by construction; K <= 33 everywhere)."""
    acc = jnp.zeros((x.shape[0], w.shape[1]), jnp.int32)
    for k in range(w.shape[0]):
        acc = acc + x[:, k:k + 1] * w[k][None, :]
    return acc


def _int_leaky(x: jnp.ndarray) -> jnp.ndarray:
    # alpha = 41/4096 ~ 0.01 (the float path's LeakyReLU slope)
    return jnp.where(x >= 0, x, (x * 41) // 4096)


def int_apply_ctx3d(ip: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Fixed-point MLP(3F+1 -> 32 -> 32 -> F); input at Q_FEAT, output at
    M_SCALE (clipped to +-M_CLIP)."""
    h = _int_leaky(_int_matmul(x, ip["l0"]["w"]) + ip["l0"]["b"][None, :])
    h = jnp.clip(h // Q_W, -H_CLIP, H_CLIP)
    h = _int_leaky(_int_matmul(h, ip["l1"]["w"]) + ip["l1"]["b"][None, :])
    h = jnp.clip(h // Q_W, -H_CLIP, H_CLIP)
    out = _int_matmul(h, ip["l2"]["w"]) + ip["l2"]["b"][None, :]
    return jnp.clip(out // (1 << M_SHIFT), -M_CLIP, M_CLIP)


def int_apply_ctx2d(ip: Dict, level: int, x: jnp.ndarray) -> jnp.ndarray:
    lin = ip[str(level)]
    out = _int_matmul(x, lin["w"]) + lin["b"][None, :]
    return jnp.clip(out // (1 << M_SHIFT), -M_CLIP, M_CLIP)


# --------------------------------------------------------- overlap weights
def int_overlap_grid(binaries: jnp.ndarray, resolution: int, rb: int
                     ) -> jnp.ndarray:
    """Integer overlap-volume pooling weights for one 3D context level.

    The float twin (_dense_mask_overlap_grids) integrates the occupancy
    indicator over each corner's +-1-cell footprint with float SAT lerps;
    here the footprint bounds are quantized once on the host (float64, so
    identical everywhere) to Q_AXIS sub-steps and the three separable pools
    run in int32.  Returns flat [r**3] weights shifted into [0, 2**OVL_BITS).
    """
    r = resolution
    c = np.arange(r, dtype=np.float64)
    scale_re = 1.0 / (r - 2.0)
    pn = (c - 0.5) * scale_re
    a_f = np.clip(pn - scale_re, 0.0, 1.0) * rb
    b_f = np.clip(pn + scale_re, 0.0, 1.0) * rb
    a_i = np.clip(np.floor(a_f), 0, rb - 1).astype(np.int32)
    b_i = np.clip(np.floor(b_f), 0, rb - 1).astype(np.int32)
    a_q = np.rint((a_f - a_i) * Q_AXIS).astype(np.int32)
    b_q = np.rint((b_f - b_i) * Q_AXIS).astype(np.int32)
    a_i1 = np.minimum(a_i + 1, rb)
    b_i1 = np.minimum(b_i + 1, rb)
    span = int(np.max(b_i - a_i)) + 1

    def pool0(x):
        s = jnp.cumsum(x, axis=0)
        s = jnp.concatenate([jnp.zeros_like(s[:1]), s], axis=0)

        def at(i0, i1, q):
            qw = jnp.asarray(q).reshape((r, 1, 1))
            return s[i0] * (Q_AXIS - qw) + s[i1] * qw

        return at(b_i, b_i1, b_q) - at(a_i, a_i1, a_q)

    # static per-axis bound tracking: values stay <= bound, so the in-pool
    # cumsum*weight product stays <= bound * rb * Q_AXIS — shifting the
    # bound to 2**12 after each axis keeps that product under 2**24
    val = binaries.astype(jnp.int32)
    bound = 1
    for _ in range(3):
        val = jnp.moveaxis(pool0(val), 0, -1)
        bound = bound * Q_AXIS * span
        if bound > (1 << 18):
            s = bound.bit_length() - 12
            val = val // (1 << s)
            bound >>= s
    # final: bring the (conservative) bound under 2**OVL_BITS
    s = max(0, bound.bit_length() - OVL_BITS)
    return (val // (1 << s)).reshape(-1)


# ------------------------------------------------------------- frac plane
def int_frac_plane(sign3: jnp.ndarray, pn_ax: Dict, fine_offset: int,
                   pn_res: int, f: int) -> jnp.ndarray:
    """Integer dimension-wise prior plane [pn_res**2, F] at Q_FEAT
    (pn_frac_plane's codec-side twin: full coverage, integer sign counts)."""
    scale = pn_res - 2
    eidx = pn_ax["entry_idx"]
    bounds = pn_ax["bounds"]
    n = pn_ax["n"]
    cap = eidx.shape[0]
    valid = jnp.arange(cap) < jnp.minimum(n, cap)
    svals = (jnp.take(sign3, fine_offset + eidx, axis=0, mode="clip")
             > 0).astype(jnp.int32)
    svals = jnp.where(valid[:, None], svals, 0)
    cols = []
    for fi in range(f):
        cs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(svals[:, fi])])
        cols.append(cs[bounds[1:]] - cs[bounds[:-1]])
    pos = jnp.stack(cols, -1)                           # [scale**2, F] int
    cnt = (bounds[1:] - bounds[:-1]).astype(jnp.int32)[:, None]
    frac_q = (pos * Q_FEAT) // jnp.maximum(cnt, 1)
    plane = frac_q.reshape(scale, scale, f)
    plane = jnp.pad(plane, ((1, 1), (1, 1), (0, 0)))
    return plane.transpose(1, 0, 2).reshape(-1, f)


# --------------------------------------------------------------- pooling
def segment_sum_int(x: jnp.ndarray, seg: jnp.ndarray, valid: jnp.ndarray,
                    num_segments: int) -> jnp.ndarray:
    """Int32 per-segment sums (exact => order-independent => deterministic)."""
    seg_safe = jnp.where(valid, seg, num_segments)
    out = jnp.zeros((num_segments,) + x.shape[1:], jnp.int32)
    mask = valid if x.ndim == 1 else valid[:, None]
    return out.at[seg_safe].add(jnp.where(mask, x, 0), mode="drop")


def host_pq(msum: np.ndarray, wsum: np.ndarray, m_scale: int) -> np.ndarray:
    """uint16 coder probabilities from integer pooled sums (one int64 host
    division; pooled p = msum / (wsum * m_scale), pq = floor(p * 65536))."""
    num = msum.astype(np.int64) * 65536
    den = np.maximum(wsum.astype(np.int64), 1) * m_scale
    if msum.ndim == 2:
        den = den[:, None]
    return np.clip(num // den, 1, 65535).astype(np.uint16)


def device_pq(msum: jnp.ndarray, wsum: jnp.ndarray,
              m_scale: int) -> jnp.ndarray:
    """host_pq computed on device, bit-identical, in 32-bit lanes.

    TPU has no int64, so floor(msum * 65536 / den) is a chunked restoring
    long division in uint32 (den < 2**27 by the per-level m_shift budget —
    wsum*m_scale carries at most vmax_bits+6+11-shift <= 27 bits — so the
    remainder shifted 5 bits at a time never overflows).  Integer ops
    are exact on every backend, so this preserves the codec's determinism
    contract; it exists to let pool programs emit uint16 probabilities
    directly (pulling 2 bytes/symbol through the relay instead of the 12
    bytes of msum+wsum+values).  Equivalence with host_pq is tested over
    the full sign/magnitude range (tests/test_codec.py)."""
    den = jnp.maximum(wsum, 1).astype(jnp.uint32) * jnp.uint32(m_scale)
    if msum.ndim == 2:
        den = den[:, None]
    pos = msum > 0
    m = jnp.where(pos, msum, 0).astype(jnp.uint32)
    # p >= 1 (msum >= den) clips to 65535; below, the quotient fits uint16
    sat = m >= den
    r = jnp.where(sat, 0, m)
    q = jnp.zeros_like(r)
    for c in (5, 5, 5, 1):      # 16 = 5+5+5+1; r < den < 2**27 => r<<5 fits
        r = r << c
        qc = r // den
        r = r - qc * den
        q = (q << c) | qc
    q = jnp.where(sat, 65535, jnp.clip(q, 1, 65535))
    return jnp.where(pos, q, 1).astype(jnp.uint16)
