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

jax.config.update("jax_enable_x64", True)
