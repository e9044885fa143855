"""Plain-scatter design validation (TPU): shape scaling + new ggi backward."""
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

# row scatter: [8M, 4] rows into [4M, 4]
n = 1 << 23
idx = jax.random.randint(key, (n,), 0, T, jnp.int32)
rows = jnp.ones((n, F), jnp.float32)
bench("scatter_row_8M",
      lambda i, v: jnp.zeros((T, F), jnp.float32).at[i].add(v, mode="drop"),
      idx, rows)

# 1-col scatter at 50M
n2 = 50 * (1 << 20)
idx2 = jax.random.randint(key, (n2,), 0, T, jnp.int32)
val2 = jnp.ones((n2,), jnp.float32)
bench("scatter1_50M",
      lambda i, v: jnp.zeros((T,), jnp.float32).at[i].add(v, mode="drop"),
      idx2, val2)

# row scatter into small pooling target [200k, 4] from 8M sorted slots
E = 200_000
slots = jnp.sort(jax.random.randint(key, (n,), 0, E, jnp.int32))
bench("scatter_row_8M_sorted_small",
      lambda i, v: jnp.zeros((E, F), jnp.float32).at[i].add(
          v, mode="drop", indices_are_sorted=True), slots, rows)
bench("scatter_row_8M_small_unsorted",
      lambda i, v: jnp.zeros((E, F), jnp.float32).at[i].add(v, mode="drop"),
      slots, rows)

# new ggi backward shape: d_table via 4 col scatters + d_w regather
N = 1 << 21
K = 24
table = jnp.zeros((T, F), jnp.float32)
gidx2 = jax.random.randint(key, (N, K), 0, T, jnp.int32)
g = jnp.ones((N, 3 * F), jnp.float32)
w2 = jnp.ones((N, K), jnp.float32)


def ggi_bwd_new(table, gidx2, g, w2):
    gflat = gidx2.reshape(-1)
    cols = []
    for fi in range(F):
        gf_rep = jnp.repeat(g[:, fi::F], K // 3, axis=1)
        col = (gf_rep * w2).reshape(-1)
        cols.append(jnp.zeros((T,), jnp.float32).at[gflat].add(
            col, mode="drop"))
    d_table = jnp.stack(cols, -1)
    tft = table.T
    d_w = jnp.zeros_like(w2)
    for fi in range(F):
        feats = tft[fi][gidx2]
        gf_rep = jnp.repeat(g[:, fi::F], K // 3, axis=1)
        d_w = d_w + gf_rep * feats
    return d_table, d_w


bench("ggi_bwd_new_50M", ggi_bwd_new, table, gidx2, g, w2)

log("done")
