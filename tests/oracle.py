"""Slow NumPy oracles that independently mirror the reference CUDA semantics.

These re-derive the kernel behavior (gridencoder.cu kernel_grid,
aligner_kernel.cu query_mask) with explicit per-point loops, for validating
the vectorized JAX ops on small inputs.
"""

import numpy as np

PRIMES = [1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437,
          2165219737]


def grid_index_oracle(pos, resolution, hashmap_size):
    d = len(pos)
    if resolution ** d <= hashmap_size:
        idx = 0
        stride = 1
        for i in range(d):
            idx += int(pos[i]) * stride
            stride *= resolution
        return idx % hashmap_size
    h = np.uint32(0)
    with np.errstate(over="ignore"):
        for i in range(d):
            h ^= np.uint32(pos[i]) * np.uint32(PRIMES[i])
    return int(h) % hashmap_size


def footprint_box_oracle(corner, resolution, rb):
    scale_re = 1.0 / (resolution - 2.0)
    lo, hi = [], []
    for c in corner:
        pn = (np.float32(c) - np.float32(0.5)) * np.float32(scale_re)
        g1 = np.float32(pn - np.float32(scale_re)) * rb
        g1 = min(max(g1, 0), rb - 1)
        g2 = np.float32(pn + np.float32(scale_re)) * rb
        g2 = min(max(g2, 0), rb - 1)
        lo.append(int(g1))
        hi.append(int(g2))
    return lo, hi


def corner_mask_oracle(corner, resolution, binary_vxl):
    rb = binary_vxl.shape[0]
    lo, hi = footprint_box_oracle(corner, resolution, rb)
    d = len(corner)
    if d == 2:
        return bool(binary_vxl[lo[0]:hi[0] + 1, lo[1]:hi[1] + 1].any())
    return bool(binary_vxl[lo[0]:hi[0] + 1, lo[1]:hi[1] + 1,
                           lo[2]:hi[2] + 1].any())


def overlap_oracle(corner, resolution, binary_vxl):
    """aligner_kernel.cu per-cell overlap accumulation (float64 for reference)."""
    rb = binary_vxl.shape[0]
    rb_re = 1.0 / rb
    scale_re = 1.0 / (resolution - 2.0)
    pn = [(c - 0.5) * scale_re for c in corner]
    lo, hi = footprint_box_oracle(corner, resolution, rb)
    d = len(corner)
    total = 0.0
    if d == 3:
        for a in range(lo[0], hi[0] + 1):
            oa = min(a * rb_re + rb_re, pn[0] + scale_re) - max(a * rb_re, pn[0] - scale_re)
            for b in range(lo[1], hi[1] + 1):
                ob = min(b * rb_re + rb_re, pn[1] + scale_re) - max(b * rb_re, pn[1] - scale_re)
                for c in range(lo[2], hi[2] + 1):
                    oc = min(c * rb_re + rb_re, pn[2] + scale_re) - max(c * rb_re, pn[2] - scale_re)
                    if binary_vxl[a, b, c]:
                        total += oa * ob * oc
        return total * rb ** 3
    for a in range(lo[0], hi[0] + 1):
        oa = min(a * rb_re + rb_re, pn[0] + scale_re) - max(a * rb_re, pn[0] - scale_re)
        for b in range(lo[1], hi[1] + 1):
            ob = min(b * rb_re + rb_re, pn[1] + scale_re) - max(b * rb_re, pn[1] - scale_re)
            if binary_vxl[a, b]:
                total += oa * ob
    return total * rb ** 2


def grid_encode_oracle(points, table, resolutions, offsets, binary_vxl=None):
    """kernel_grid forward for a static level range (level-major concat)."""
    n, d = points.shape
    f = table.shape[1]
    n_levels = len(resolutions)
    out = np.zeros((n, n_levels * f), dtype=np.float64)
    for li, r in enumerate(resolutions):
        hs = offsets[li + 1] - offsets[li]
        for i in range(n):
            x = points[i]
            if np.any(x < 0) or np.any(x > 1):
                continue
            pos = x.astype(np.float32) * np.float32(r - 2) + np.float32(0.5)
            pg = np.floor(pos).astype(np.int64)
            frac = pos - pg
            acc = np.zeros(f)
            wn = 0.0
            for corner in range(1 << d):
                w = 1.0
                cc = []
                for ax in range(d):
                    if corner & (1 << ax):
                        w *= frac[ax]
                        cc.append(min(pg[ax] + 1, r - 1))
                    else:
                        w *= 1 - frac[ax]
                        cc.append(pg[ax])
                zero_flag = any(c == 0 or c == r - 1 for c in cc)
                if zero_flag:
                    continue
                if binary_vxl is not None and not corner_mask_oracle(cc, r, binary_vxl):
                    continue
                idx = grid_index_oracle(cc, r, hs)
                acc += w * table[offsets[li] + idx]
                wn += w
            if wn == 0:
                wn = 1e-9
            out[i, li * f:(li + 1) * f] = acc / wn
    return out
