#!/usr/bin/env python
"""Pallas/Mosaic probe: can a VMEM-resident hash table beat XLA's
gather/scatter floor for the hash-encode hot ops? (VERDICT r2 #2)

The hash-encode forward gathers ~50M random [F<=8]-wide rows per step and
its backward scatter-adds the same count; XLA measures ~7 ns/gather and
~8-10 ns/column-scatter-add (tools/sort_probe*.py, ARCHITECTURE.md).  Mosaic
cannot gather along the SUBLANE axis (take axis=0 fails to lower), but CAN
take_along_axis along the LANE axis — so a [F, T] transposed table whose
entries live in lanes supports row-gathers as lane shuffles.  This probe
measures, on real hardware:

  1. pallas gather: [8, T] f32 table in VMEM, N indices streamed in blocks,
     take_along_axis(table, idx, axis=1)
  2. pallas serial scatter-add: acc[:, idx[i]] += val for each index in a
     fori_loop (dynamic-lane read-modify-write)
  3. XLA baselines for both on identical data

Numbers go to ARCHITECTURE.md; integration only happens if (1)/(2) beat the
XLA floor by enough to matter end-to-end.

VERDICT (measured v5e 2026-08-18, see ARCHITECTURE.md "Pallas probe
verdict"): both kernels fail to compile at every table width 2^7..2^18.
Mosaic's take_along_axis lowering asserts index.shape == source.shape, and
its tpu.dynamic_gather rejects sources wider than one vreg (128 f32 lanes:
"Multiple source vregs along gather dimension"); the serial scatter's
dynamic lane RMW needs 128-aligned offsets ("cannot statically prove that
index in dimension 1 is a multiple of 128").  XLA floors measured here:
row-8 gather 15.2 ns/row, column scatter-add 9.8 ns/update.

Usage: JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site:/root/repo \
         python -u tools/pallas_probe.py [n_indices] [log2_table]
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# PALLAS_INTERPRET=1 runs the kernels through the Pallas interpreter on any
# backend (CPU included) — correctness-only validation before a TPU slot.
INTERPRET = bool(int(os.environ.get("PALLAS_INTERPRET", "0")))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, reps=3):
    fn(*args)  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        best = min(best, time.time() - t0)
    return best


# ----------------------------------------------------------- pallas gather
def gather_kernel(tbl_ref, idx_ref, out_ref):
    """tbl [8, T] VMEM-resident; idx [8, NB] (same index broadcast across
    sublanes); out [8, NB] = tbl[:, idx]."""
    out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=1)


def pallas_gather(tbl_t, idx8, block):
    n = idx8.shape[1]
    grid = (n // block,)
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        grid=grid,
        interpret=INTERPRET,
        in_specs=[
            pl.BlockSpec((8, tbl_t.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(tbl_t, idx8)


# ----------------------------------------------- pallas serial scatter-add
def scatter_kernel(idx_ref, val_ref, out_ref):
    nb = idx_ref.shape[1]

    def body(i, _):
        e = idx_ref[0, i]
        out_ref[:, e] += val_ref[:, i]
        return 0

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    jax.lax.fori_loop(0, nb, body, 0)


def pallas_scatter(idx8, vals, t, block):
    n = idx8.shape[1]
    return pl.pallas_call(
        scatter_kernel,
        out_shape=jax.ShapeDtypeStruct((8, t), jnp.float32),
        grid=(n // block,),
        interpret=INTERPRET,
        in_specs=[
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, t), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(idx8, vals)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 23
    log2_t = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    t = 1 << log2_t
    block = min(1 << 13, n)
    log(f"N={n} T={t} ({t * 8 * 4 / 2 ** 20:.1f} MB transposed table)")

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, t, n, dtype=np.int32))
    idx8 = jnp.broadcast_to(idx[None, :], (8, n))
    tbl = jnp.asarray(rng.standard_normal((t, 8), np.float32))
    tbl_t = jnp.asarray(np.asarray(tbl).T.copy())
    vals = jnp.asarray(rng.standard_normal((8, n), np.float32))

    results = {}

    # XLA row gather baseline [N] -> [N, 8]
    xg = jax.jit(lambda tb, ix: jnp.take(tb, ix, axis=0))
    dt = timeit(xg, tbl, idx)
    results["xla_gather_row8"] = dt
    log(f"XLA row gather:      {dt * 1e3:8.1f} ms  ({dt / n * 1e9:.2f} ns/idx)")

    # pallas lane gather
    try:
        pg = jax.jit(functools.partial(pallas_gather, block=block))
        dt = timeit(pg, tbl_t, idx8)
        results["pallas_gather"] = dt
        log(f"pallas lane gather:  {dt * 1e3:8.1f} ms  ({dt / n * 1e9:.2f} ns/idx)")
        ok = bool(jnp.allclose(pg(tbl_t, idx8)[:, :64],
                               xg(tbl, idx[:64]).T, atol=0))
        log(f"  gather correct: {ok}")
    except Exception as e:
        log(f"pallas lane gather FAILED TO LOWER: {type(e).__name__}: "
            f"{str(e)[:300]}")

    # XLA column scatter-add baseline (the production backward path)
    def xs(ix, v):
        out = jnp.zeros((t,), jnp.float32)
        return out.at[ix].add(v[0])

    dt = timeit(jax.jit(xs), idx, vals)
    results["xla_scatter_col"] = dt
    log(f"XLA col scatter-add: {dt * 1e3:8.1f} ms  ({dt / n * 1e9:.2f} ns/upd)"
        f"  (x8 features = {8 * dt / n * 1e9:.1f} ns/row)")

    # pallas serial scatter-add
    try:
        ps = jax.jit(functools.partial(pallas_scatter, t=t, block=block))
        dt = timeit(ps, idx8, vals)
        results["pallas_scatter"] = dt
        log(f"pallas serial scatter: {dt * 1e3:6.1f} ms  "
            f"({dt / n * 1e9:.2f} ns/row-of-8)")
        want = np.zeros((t,), np.float32)
        np.add.at(want, np.asarray(idx[:4096]),
                  np.asarray(vals[0, :4096]))
        # the timing jit's block may exceed 4096 (zero-size grid) — use a
        # check-sized block
        ps_chk = jax.jit(functools.partial(pallas_scatter, t=t, block=4096))
        got = np.asarray(ps_chk(idx8[:, :4096], vals[:, :4096]))[0]
        log(f"  scatter correct: {np.allclose(got, want, atol=1e-3)}")
    except Exception as e:
        log(f"pallas serial scatter FAILED TO LOWER: {type(e).__name__}: "
            f"{str(e)[:300]}")

    print({k: round(v, 4) for k, v in results.items()})


if __name__ == "__main__":
    main()
