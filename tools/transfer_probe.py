#!/usr/bin/env python
"""Measure host->device (device_put) and device->host throughput through
the axon tunnel.

Decision gate for the entropy-table disk cache (VERDICT r2 #5): the fused
on-device build costs 144-824 s depending on relay contention; reloading
~1.8 GB of prebuilt tables from disk only wins if plain device_put moves
data much faster than the ~7 s/MB measured for jit-closure constant
fetches (which go through lowering, not this path).

Usage: JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site:/root/repo \
         python -u tools/transfer_probe.py [mb]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    log("devices:", jax.devices())
    n = mb * (1 << 20) // 4
    host = np.random.default_rng(0).integers(
        0, 1 << 20, n, dtype=np.int32)

    # warm the transfer path with a small array first
    jax.device_put(host[:1024]).block_until_ready()

    for size_mb in (1, 8, mb):
        m = size_mb * (1 << 20) // 4
        t0 = time.time()
        dev = jax.device_put(host[:m])
        dev.block_until_ready()
        dt = time.time() - t0
        log(f"h2d {size_mb:4d} MB: {dt:7.2f}s  ({size_mb / dt:8.1f} MB/s)")

    t0 = time.time()
    back = np.asarray(dev)
    dt = time.time() - t0
    log(f"d2h {mb:4d} MB: {dt:7.2f}s  ({mb / dt:8.1f} MB/s)")
    assert np.array_equal(back, host[:m])
    print({"d2h_mb_s": round(mb / dt, 1)})


if __name__ == "__main__":
    main()
