"""Round-4 hardware decision probe for ops/pallas_scatter (VERDICT r3 #7).

Measures the Pallas serial lane-RMW scatter (one update carries all F
feature sublanes) against the XLA 4x f32 column scatter baseline at
render-backward scale, across level sizes.  Decision rule: the Pallas
per-(index, F-row) cost must beat 4x the XLA per-column-update cost
(~28 ns/row at F=4) to win.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/pallas_scatter_probe_r4.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp

from cnc_tpu.utils.jit_cache import ensure_compilation_cache
from cnc_tpu.ops import pallas_scatter as ps

ensure_compilation_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(out):
    leaves = jax.tree.leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timed(name, fn, *args, per=None, reps=4):
    t0 = time.time()
    _sync(fn(*args))
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / reps
    unit = f"; {dt / per * 1e9:7.2f} ns/row" if per else ""
    log(f"{name:46s} {dt * 1e3:9.2f} ms{unit}  (compile+1st {tc:.1f}s)")
    return dt


def main():
    log("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    n = 4 * 1024 * 1024          # one level's N*C at render scale
    vals8 = jax.random.normal(key, (8, n), jnp.float32)
    vals4 = vals8[:4].T.copy()   # [N, 4] for the XLA baseline

    import functools

    @functools.partial(jax.jit, static_argnames=("size",))
    def xla_4col(v4, i, size):
        return tuple(jnp.zeros((size,), jnp.float32).at[i].add(
            v4[:, c], mode="drop") for c in range(4))

    for t in (1 << 13, 1 << 16, 1 << 18, 1 << 19):
        idx = jax.random.randint(jax.random.fold_in(key, t), (n,), 0, t,
                                 dtype=jnp.int32)
        _sync((idx, vals8))
        try:
            timed(f"pallas T=2^{t.bit_length()-1} (F-row/update)",
                  lambda i, v: ps.scatter_add_table(i, v, t), idx, vals8,
                  per=n)
        except Exception as e:  # noqa: BLE001
            log(f"pallas T={t} FAILED: {type(e).__name__}: "
                f"{str(e)[:300]}")
        timed(f"xla 4col T=2^{t.bit_length()-1} (4 updates/row)",
              lambda i, v, t=t: xla_4col(v, i, size=t), idx, vals4, per=n)


if __name__ == "__main__":
    main()
