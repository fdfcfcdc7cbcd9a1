import os

# Run tests hermetically on CPU with 8 virtual devices so sharding/mesh tests
# work without real TPU chips (SURVEY.md §4). The container preloads a TPU
# PJRT plugin via sitecustomize and pins JAX_PLATFORMS in the environment, so
# plain env vars are not enough — jax.config.update before first backend use
# is what actually switches platforms.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
