"""Compile-time attribution inside grouped_gather_interp backward (TPU)."""
import os
import sys
import tempfile
import time

os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(prefix="jaxcc_")

import jax
import jax.numpy as jnp

from cnc_tpu.ops import scatter_ops as so


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(name, fn, *args, iters=2):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    tc = time.time() - t0
    r = c(*args)
    leaves = jax.tree.leaves(r)
    s = float(jnp.sum(leaves[0]))
    t0 = time.time()
    for _ in range(iters):
        r = c(*args)
        s = float(jnp.sum(jax.tree.leaves(r)[0]))
    rt = (time.time() - t0) / iters
    log(f"{name}: compile={tc:.1f}s run={rt*1e3:.0f}ms")


key = jax.random.PRNGKey(0)
T = 4_000_000
F = 4
N = 1 << 21
K = 24
NK = N * K

which = set(sys.argv[1:])


def want(x):
    return not which or x in which


if want("densify"):
    # one chunk of the merge-densify: sort5 + chunked 5-tuple scans + compact
    n = so._SORT_CHUNK
    idx = jax.random.randint(key, (n,), 0, T, jnp.int32)
    cols = tuple(jnp.ones((n,), jnp.float32) for _ in range(F))
    bench("densify_one_4M", lambda i, *c: so._densify_one(c, i, T), idx, *cols)

if want("segscan"):
    n = 1 << 23
    keys = jnp.sort(jax.random.randint(key, (n,), 0, T, jnp.int32))
    cols = tuple(jnp.ones((n,), jnp.float32) for _ in range(F))
    bench("segscan5_8M",
          lambda k, *c: so._chunked_segment_inclusive_cols(c, k), keys, *cols)

if want("full"):
    idx = jax.random.randint(key, (NK,), 0, T, jnp.int32)
    cols = tuple(jnp.ones((NK,), jnp.float32) for _ in range(F))
    bench("scatter_add_sorted_50M",
          lambda i, *c: so.scatter_add_sorted_cols(c, i, T), idx, *cols)

if want("dw"):
    table = jnp.zeros((T, F), jnp.float32)
    gidx2 = jax.random.randint(key, (N, K), 0, T, jnp.int32)
    g = jnp.ones((N, 3 * F), jnp.float32)
    w2 = jnp.ones((N, K), jnp.float32)

    def dw(table, gidx2, g, w2):
        tft = table.T
        d_w = jnp.zeros_like(w2)
        for fi in range(F):
            feats = tft[fi][gidx2]
            gf_rep = jnp.repeat(g[:, fi::F], K // 3, axis=1)
            d_w = d_w + gf_rep * feats
        return d_w

    bench("dw_term", dw, table, gidx2, g, w2)

if want("cols"):
    g = jnp.ones((N, 3 * F), jnp.float32)
    w2 = jnp.ones((N, K), jnp.float32)

    def mkcols(g, w2):
        out = []
        for fi in range(F):
            gf = g[:, fi::F]
            gf_rep = jnp.repeat(gf, K // 3, axis=1)
            out.append((gf_rep * w2).reshape(-1))
        return tuple(out)

    bench("upd_cols", mkcols, g, w2)

log("done")
