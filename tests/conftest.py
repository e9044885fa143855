import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware.  This environment pre-sets
# JAX_PLATFORMS=axon (tunneled TPU) and its sitecustomize imports jax at
# interpreter start, so a plain env override is ignored — the platform must
# be forced through jax.config before any backend initializes.  Grabbing the
# real chip from tests both contends with benchmarks and pays ~30s
# remote-compile latency per jit.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()
