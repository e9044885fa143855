"""A/B: closure-captured device array vs jit argument — lowering cost on axon."""
import os
import tempfile
import time

os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(prefix="jaxcc_")

import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)
big = jax.random.normal(key, (1 << 21,), jnp.float32)   # 8 MB device array
jax.block_until_ready(big)


def as_arg(x, b):
    return jnp.sum(x * b[: x.shape[0]])


def as_closure(x):
    return jnp.sum(x * big[: x.shape[0]])


x = jnp.ones((1 << 21,), jnp.float32)

for name, fn, args in (("arg", as_arg, (x, big)), ("closure", as_closure, (x,))):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    print(f"{name}: lower={t1-t0:.1f}s compile={t2-t1:.1f}s", flush=True)
