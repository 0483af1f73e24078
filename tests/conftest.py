import os

# Tests run on CPU with a virtual 8-device mesh so sharding/pjit paths are
# exercised without TPU hardware (standard JAX trick, SURVEY.md section 4).
# Force CPU: the session may preset JAX_PLATFORMS=axon (tunneled TPU), which
# must never be used for unit tests (slow remote dispatch, shared chip).
# A sitecustomize.py may override the env var, so also set jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
