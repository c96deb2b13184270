import os

# Tests run on a virtual 8-device CPU mesh with float64 enabled so we can
# check bitwise-tolerant parity against the (numpy float64) reference math.
# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (remote TPU
# tunnel); unit tests must run on the local virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The ambient sitecustomize may have imported jax (registering the remote
# TPU plugin) BEFORE this conftest ran, in which case the env vars above
# were read too late — set the config directly as well, which is effective
# post-import as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
