"""Segment scans over flattened sample buffers.

TPU-shaped equivalents of the reference's ragged per-ray scan kernels
(nerfacc/scan.py + cuda/csrc/scan.cu): samples live in a flat, statically
sized buffer; segment membership is given by an id per element.  Segments are
assumed *contiguous* (all elements of a segment adjacent, ids sorted) — the
layout every producer in this codebase emits.

Implemented with a segmented `lax.associative_scan` (carry = (value, boundary
flag)), so sums never accumulate across segment boundaries — float32 precision
matches the reference's per-ray Blelloch scans instead of a global cumsum.
All ops are differentiable through plain JAX (cumsum backward = reversed scan,
matching scan.cu:206-214).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _segment_heads(seg_id: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([jnp.ones((1,), bool), seg_id[1:] != seg_id[:-1]])


def _seg_scan(x: jnp.ndarray, head: jnp.ndarray) -> jnp.ndarray:
    def combine(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va + vb), fa | fb

    v, _ = jax.lax.associative_scan(combine, (x, head))
    return v


def segment_inclusive_sum(x: jnp.ndarray, seg_id: jnp.ndarray,
                          num_segments: int | None = None) -> jnp.ndarray:
    """Inclusive prefix sum within contiguous segments.

    Matches nerfacc `inclusive_sum` (scan.py docstring example):
      x=[1,2,3,4], ids=[0,0,1,1] -> [1,3,3,7]
    """
    del num_segments
    return _seg_scan(x, _segment_heads(seg_id))


def segment_exclusive_sum(x: jnp.ndarray, seg_id: jnp.ndarray,
                          num_segments: int | None = None) -> jnp.ndarray:
    """Exclusive prefix sum within contiguous segments.

    Matches nerfacc `exclusive_sum`:
      x=[1,2,3,4], ids=[0,0,1,1] -> [0,1,0,3]
    """
    return segment_inclusive_sum(x, seg_id) - x


def segment_inclusive_prod(x: jnp.ndarray, seg_id: jnp.ndarray,
                           num_segments: int | None = None) -> jnp.ndarray:
    """Inclusive prefix product within contiguous segments."""
    del num_segments
    head = _segment_heads(seg_id)

    def combine(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va * vb), fa | fb

    v, _ = jax.lax.associative_scan(combine, (x, head))
    return v


def segment_exclusive_prod(x: jnp.ndarray, seg_id: jnp.ndarray,
                           num_segments: int | None = None) -> jnp.ndarray:
    """Exclusive prefix product within contiguous segments.

    The reference avoids exclusive_prod gradients at zero inputs
    (volrend.py:199-201) and computes transmittance in log space; so do the
    renderers here — this op exists for API parity.
    """
    incl = segment_inclusive_prod(x, seg_id)
    head = _segment_heads(seg_id)
    shifted = jnp.concatenate([jnp.ones((1,), x.dtype), incl[:-1]])
    return jnp.where(head, jnp.ones((), x.dtype), shifted)


def pack_info(seg_id: jnp.ndarray, valid: jnp.ndarray,
              num_segments: int) -> jnp.ndarray:
    """(start, count) per segment over the valid elements — nerfacc pack.py:11-49."""
    counts = jax.ops.segment_sum(valid.astype(jnp.int32), seg_id,
                                 num_segments=num_segments,
                                 indices_are_sorted=True)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    return jnp.stack([starts, counts], axis=-1)
