import os

# Tests run on a virtual 8-device CPU mesh; the real TPU is reserved for
# bench.py.  The environment's sitecustomize force-registers the "axon" TPU
# backend regardless of JAX_PLATFORMS, so we also override via jax.config
# (backends initialise lazily, so this wins as long as it runs before any
# computation).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu"
