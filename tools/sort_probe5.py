"""Forward-gather and packed-scatter runtime variants (TPU)."""
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


def bench(name, fn, *args, iters=3):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    tc = time.time() - t0
    r = c(*args)
    s = float(jnp.sum(jnp.abs(jax.tree.leaves(r)[0])))
    t0 = time.time()
    for _ in range(iters):
        r = c(*args)
        s = float(jnp.sum(jnp.abs(jax.tree.leaves(r)[0])))
    rt = (time.time() - t0) / iters
    log(f"{name}: compile={tc:.1f}s run={rt*1e3:.0f}ms")


key = jax.random.PRNGKey(0)
T = 4_000_000
F = 4
N = 1 << 18          # render-path scale
K = 96               # 12 levels x 8 corners
G = 12

table = jax.random.normal(key, (T, F), jnp.float32)
gidx2 = jax.random.randint(key, (N, K), 0, T, jnp.int32)
w2 = jax.random.uniform(key, (N, K), jnp.float32)

# current feature-major fused op, forward only
bench("ggi_fwd_cur", lambda t, g, w: so.grouped_gather_interp(t, g, w, G, F),
      table, gidx2, w2)

# row-gather + einsum reduce (materializes [N, K, F])
def fwd_rowgather(t, g, w):
    feats = jnp.take(t, g, axis=0, mode="clip")       # [N, K, F]
    c = K // G
    accs = []
    for gi in range(G):
        blk_w = w[:, gi * c:(gi + 1) * c]
        blk_f = feats[:, gi * c:(gi + 1) * c]
        accs.append(jnp.einsum("nc,ncf->nf", blk_w, blk_f))
    return jnp.concatenate(accs, axis=1)


bench("fwd_rowgather", fwd_rowgather, table, gidx2, w2)


# row-gather reshaped to [N, K*F] then static-column weighted sums
def fwd_rowgather_flat(t, g, w):
    feats = jnp.take(t, g, axis=0, mode="clip").reshape(N, K * F)
    out = None
    c = K // G
    # out[n, g*F+f] = sum_c w[n, g*C+c] * feats[n, (g*C+c)*F + f]
    accs = []
    for f in range(F):
        wf = feats[:, f::F] * w                        # [N, K]
        acc = wf[:, 0::c]
        for ci in range(1, c):
            acc = acc + wf[:, ci::c]
        accs.append(acc)                               # [N, G]
    out = jnp.concatenate(accs, axis=1)
    return out


bench("fwd_rowgather_flat", fwd_rowgather_flat, table, gidx2, w2)

# full grad of current op at render scale
bench("ggi_grad_cur",
      jax.grad(lambda t: jnp.sum(so.grouped_gather_interp(t, gidx2, w2, G, F))),
      table)

# c64-packed d_table scatter: 2 complex scatters instead of 4 float
nk = N * K
gflat = gidx2.reshape(-1)
cols = tuple(jax.random.normal(jax.random.fold_in(key, i), (nk,), jnp.float32)
             for i in range(F))


def dtable_f32(g, *cs):
    return tuple(jnp.zeros((T,), jnp.float32).at[g].add(c, mode="drop")
                 for c in cs)


def dtable_c64(g, *cs):
    outs = []
    for i in range(0, F, 2):
        z = jax.lax.complex(cs[i], cs[i + 1])
        o = jnp.zeros((T,), jnp.complex64).at[g].add(z, mode="drop")
        outs.append(jnp.real(o))
        outs.append(jnp.imag(o))
    return tuple(outs)


bench("dtable_f32_25M", dtable_f32, gflat, *cols)
bench("dtable_c64_25M", dtable_c64, gflat, *cols)

log("done")
