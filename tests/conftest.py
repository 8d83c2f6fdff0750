import os

# Force an 8-virtual-device CPU mesh for all tests.  The container's
# sitecustomize registers the 'axon' TPU backend in every process, so the
# platform must be overridden via jax.config (env vars alone are read too
# early); XLA_FLAGS still works as long as no backend was initialized yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8
