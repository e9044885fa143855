"""TPU compile + runtime scaling of lax.sort variants and scatter-adds.

Determines the cheapest structure for the sort-based scatter-add backward.
"""
import os
import sys
import tempfile
import time

os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(prefix="jaxcc_")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(name, fn, *args, iters=3):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    tc = time.time() - t0
    r = c(*args)
    s = float(jnp.sum(r[0] if isinstance(r, (tuple, list)) else r))  # sync
    t0 = time.time()
    for _ in range(iters):
        r = c(*args)
        s = float(jnp.sum(r[0] if isinstance(r, (tuple, list)) else r))
    rt = (time.time() - t0) / iters
    log(f"{name}: compile={tc:.1f}s run={rt*1e3:.0f}ms")


key = jax.random.PRNGKey(0)
T = 4_000_000
F = 4

for n_log in (20, 23):
    n = 1 << n_log
    k = jax.random.randint(key, (n,), 0, T, jnp.int32)
    i = jnp.arange(n, dtype=jnp.int32)
    vals = [jnp.ones((n,), jnp.float32) for _ in range(F)]

    bench(f"sort1_2^{n_log}", lambda k: jax.lax.sort((k,), num_keys=1), k)
    bench(f"sort2_2^{n_log}",
          lambda k, i: jax.lax.sort((k, i), num_keys=1), k, i)
    bench(f"sort5_2^{n_log}",
          lambda k, *v: jax.lax.sort((k,) + v, num_keys=1), k, *vals)

# gather 4 columns by permutation at 2^23
n = 1 << 23
perm = jax.random.randint(key, (n,), 0, n, jnp.int32)
cols = tuple(jnp.ones((n,), jnp.float32) for _ in range(F))
bench("gather4x2^23", lambda p, *c: tuple(x[p] for x in c), perm, *cols)

# unique-index scatter-add: 4M unique updates into [T] per column
nu = 1 << 22
uidx = jax.random.permutation(key, jnp.arange(T, dtype=jnp.int32))[:nu]
uval = jnp.ones((nu,), jnp.float32)
bench("uscatter1_4M",
      lambda i, v: jnp.zeros((T,), jnp.float32).at[i].add(
          v, unique_indices=True, mode="drop"), uidx, uval)

# plain non-unique scatter-add 2^23 -> [T]
idx = jax.random.randint(key, (n,), 0, T, jnp.int32)
val = jnp.ones((n,), jnp.float32)
bench("scatter1_2^23",
      lambda i, v: jnp.zeros((T,), jnp.float32).at[i].add(v, mode="drop"),
      idx, val)

log("done")
