import os

# Force all tests onto a virtual 8-device CPU mesh: fast compiles, full f32
# precision, and multi-chip sharding without TPU hardware. Set
# POINTNERF_TEST_PLATFORM=axon to run the suite on a real chip.
#
# NOTE: the environment's sitecustomize imports jax at interpreter startup
# with JAX_PLATFORMS=axon already baked in, so the env var is captured before
# this file runs — we must override through jax.config instead.
_platform = os.environ.get("POINTNERF_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
