"""Scatter variants + candidate densify replacement (TPU)."""
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
    s = float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.time()
    for _ in range(iters):
        r = c(*args)
        s = float(jnp.sum(jax.tree.leaves(r)[0]))
    rt = (time.time() - t0) / iters
    log(f"{name}: compile={tc:.1f}s run={rt*1e3:.0f}ms")


key = jax.random.PRNGKey(0)
T = 4_000_000
F = 4
n = 1 << 23

idx = jax.random.randint(key, (n,), 0, T, jnp.int32)
val = jnp.ones((n,), jnp.float32)

# plain non-unique scatter-add, 1 column
bench("scatter1_8M",
      lambda i, v: jnp.zeros((T,), jnp.float32).at[i].add(v, mode="drop"),
      idx, val)

# masked unique scatter: most rows dropped via out-of-range index
uniq = jnp.where(jnp.arange(n) % 2 == 0, idx, T)  # ~4M in-range (NOT unique,
# but emulates cost shape: half dropped)  -- runtime shape probe only
bench("uscatter_mask_8M",
      lambda i, v: jnp.zeros((T,), jnp.float32).at[i].add(
          v, mode="drop", unique_indices=True), uniq, val)

# candidate densify: sort5 + head/tail + cumsum + 2 masked unique scatters
cols = tuple(jnp.ones((n,), jnp.float32) for _ in range(F))


def densify_v2(i, *cs):
    sorted_arrs = jax.lax.sort((i,) + cs, num_keys=1)
    sk = sorted_arrs[0]
    tail = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
    head = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    tidx = jnp.where(tail, sk, T)
    hidx = jnp.where(head, sk, T)
    outs = []
    for c in sorted_arrs[1:]:
        cs_ = jnp.cumsum(c)
        pre = jnp.concatenate([jnp.zeros((1,), c.dtype), cs_[:-1]])
        o = jnp.zeros((T,), c.dtype).at[tidx].add(
            cs_, mode="drop", unique_indices=True)
        o = o.at[hidx].add(-pre, mode="drop", unique_indices=True)
        outs.append(o)
    return tuple(outs)


bench("densify_v2_8M", densify_v2, idx, *cols)


# same but argsort(key,iota) + gathered columns
def densify_v3(i, *cs):
    sk, perm = jax.lax.sort((i, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    tail = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
    head = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    tidx = jnp.where(tail, sk, T)
    hidx = jnp.where(head, sk, T)
    outs = []
    for c in cs:
        cp = c[perm]
        cs_ = jnp.cumsum(cp)
        pre = jnp.concatenate([jnp.zeros((1,), c.dtype), cs_[:-1]])
        o = jnp.zeros((T,), c.dtype).at[tidx].add(
            cs_, mode="drop", unique_indices=True)
        o = o.at[hidx].add(-pre, mode="drop", unique_indices=True)
        outs.append(o)
    return tuple(outs)


bench("densify_v3_8M", densify_v3, idx, *cols)

log("done")
