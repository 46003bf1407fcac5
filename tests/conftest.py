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

# Persistent XLA compile cache (content-hashed, so always safe): repeat
# suite runs skip recompiling unchanged programs — test_training.py alone
# saves minutes on this 1-core host.
from gesture_diffusion_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/root/.cache/jax_comp_tests")

assert jax.default_backend() == "cpu"


def pytest_collection_modifyitems(config, items):
    """Run the 2-process jax.distributed test LAST: its two workers share
    this host's single core with a hard wall-clock bound, so any test
    still running concurrently (xdist or a stray background compile)
    starves them — measured as the only full-suite flake in round 4."""
    items.sort(key=lambda it: it.fspath.basename == "test_multiprocess.py")
