"""Round-4 TPU micro-probe: can the XLA scatter/gather index-op floor move?

Questions (each answered by a timed variant at render-backward scale):
  1. complex64 column scatter-add: complex adds componentwise, so one
     complex64 update carries TWO independent f32 accumulations.  If the
     per-UPDATE cost matches f32 (index-op bound, not byte bound), packing
     F=4 feature columns into 2 complex columns halves the dominant cost of
     grouped_gather_interp's backward (ops/scatter_ops._ggi_bwd).
  2. bf16 column scatter-add per-update cost.
  3. indices_are_sorted=True on a pre-sorted scatter.
  4. gather width sweep: f32 row-4 vs bf16 row-4 vs uint8 scalar vs bool
     (the occupancy-mask gathers) vs packed-uint32 sign words.
  5. table-size sensitivity of scatter cost (2^19 vs 2^12 entries).
  6. tunnel dispatch overhead: trivial jit roundtrip (bounds what per-step
     host sync costs through the axon relay).

Run:  python tools/scatter_probe_r4.py            (real TPU via axon)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from cnc_tpu.utils.jit_cache import ensure_compilation_cache
ensure_compilation_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = 8 * 1024 * 1024        # index count ~ render-backward per-level scale
T = 1 << 19                # flagship level size
REPS = 8


def _sync(out):
    # block_until_ready does not synchronize through the axon relay —
    # pull a tiny reduction to host instead (verify skill, 2026-08-16)
    leaves = jax.tree.leaves(out)
    return float(jnp.sum(jnp.real(leaves[0].astype(jnp.float32))))


def timed(name, fn, *args, per=None):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / REPS
    unit = f"; {dt / per * 1e9:7.2f} ns/op" if per else ""
    log(f"{name:44s} {dt * 1e3:9.2f} ms{unit}")
    return dt


def main():
    log("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T, dtype=jnp.int32)
    idx_sorted = jnp.sort(idx)
    vals = jax.random.normal(key, (N,), jnp.float32)
    vals2 = jax.random.normal(jax.random.fold_in(key, 1), (N,), jnp.float32)
    cvals = jax.lax.complex(vals, vals2)
    bvals = vals.astype(jnp.bfloat16)
    _sync((idx, vals))

    # ---- scatters -------------------------------------------------------
    @jax.jit
    def scat_f32(v, i):
        return jnp.zeros((T,), jnp.float32).at[i].add(v, mode="drop")

    @jax.jit
    def scat_c64(v, i):
        return jnp.zeros((T,), jnp.complex64).at[i].add(v, mode="drop")

    @jax.jit
    def scat_bf16(v, i):
        return jnp.zeros((T,), jnp.bfloat16).at[i].add(v, mode="drop")

    @jax.jit
    def scat_f32_sorted(v, i):
        return jnp.zeros((T,), jnp.float32).at[i].add(
            v, mode="drop", indices_are_sorted=True)

    @jax.jit
    def scat_f32_small(v, i):
        return jnp.zeros((1 << 12,), jnp.float32).at[i & 0xFFF].add(
            v, mode="drop")

    @jax.jit
    def scat_4cols(v, i):
        return tuple(jnp.zeros((T,), jnp.float32).at[i].add(v * c,
                                                            mode="drop")
                     for c in (1.0, 2.0, 3.0, 4.0))

    @jax.jit
    def scat_2c64(v, i):
        a = jax.lax.complex(v, v * 2.0)
        b = jax.lax.complex(v * 3.0, v * 4.0)
        return (jnp.zeros((T,), jnp.complex64).at[i].add(a, mode="drop"),
                jnp.zeros((T,), jnp.complex64).at[i].add(b, mode="drop"))

    timed("scatter f32 col (baseline)", scat_f32, vals, idx, per=N)
    try:
        timed("scatter complex64 col", scat_c64, cvals, idx, per=N)
        timed("scatter 2x complex64 (=4 f32 cols)", scat_2c64, vals, idx,
              per=2 * N)
    except Exception as e:  # noqa: BLE001
        log(f"complex64 scatter FAILED: {type(e).__name__}: {e}")
    try:
        timed("scatter bf16 col", scat_bf16, bvals, idx, per=N)
    except Exception as e:  # noqa: BLE001
        log(f"bf16 scatter FAILED: {type(e).__name__}: {e}")
    timed("scatter f32 col sorted-idx flag", scat_f32_sorted, vals,
          idx_sorted, per=N)
    timed("scatter f32 col small table 2^12", scat_f32_small, vals, idx,
          per=N)
    timed("scatter 4x f32 cols (current bwd)", scat_4cols, vals, idx,
          per=4 * N)

    # ---- gathers --------------------------------------------------------
    tbl_f32 = jax.random.normal(key, (T, 4), jnp.float32)
    tbl_bf16 = tbl_f32.astype(jnp.bfloat16)
    tbl_u8 = (tbl_f32[:, 0] > 0).astype(jnp.uint8)
    tbl_bool = tbl_f32[:, 0] > 0
    tbl_u32 = jax.random.randint(key, (T,), 0, 2**31 - 1,
                                 dtype=jnp.int32).astype(jnp.uint32)
    tbl_f32_1 = tbl_f32[:, 0]
    _sync((tbl_f32,))

    @jax.jit
    def gat_row4_f32(t, i):
        return jnp.take(t, i, axis=0, mode="clip")

    @jax.jit
    def gat_row4_bf16(t, i):
        return jnp.take(t, i, axis=0, mode="clip")

    @jax.jit
    def gat_scalar(t, i):
        return jnp.take(t, i, axis=0, mode="clip")

    timed("gather f32 row-4", gat_row4_f32, tbl_f32, idx, per=N)
    timed("gather bf16 row-4", gat_row4_bf16, tbl_bf16, idx, per=N)
    timed("gather f32 scalar", gat_scalar, tbl_f32_1, idx, per=N)
    timed("gather uint8 scalar (packed signs)", gat_scalar, tbl_u8, idx,
          per=N)
    timed("gather bool scalar (occ mask)", gat_scalar, tbl_bool, idx, per=N)
    timed("gather uint32 scalar (sign words)", gat_scalar, tbl_u32, idx,
          per=N)

    # ---- dispatch roundtrip ---------------------------------------------
    @jax.jit
    def noop(x):
        return x + 1.0

    x = jnp.zeros(())
    _sync(noop(x))
    t0 = time.time()
    for _ in range(20):
        x = noop(x)
        _sync(x)
    log(f"sync host-pull roundtrip: {(time.time() - t0) / 20 * 1e3:.2f} ms")
    t0 = time.time()
    for _ in range(20):
        x = noop(x)
    _sync(x)
    log(f"async dispatch chain:     {(time.time() - t0) / 20 * 1e3:.2f} ms/call")


if __name__ == "__main__":
    main()
