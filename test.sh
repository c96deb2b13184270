#!/bin/bash
# Run the test suite on the local CPU backend with a virtual 8-device mesh.
#
# PALLAS_AXON_POOL_IPS is cleared so the ambient sitecustomize.py does not
# register the remote-TPU PJRT plugin (each registration performs a blocking
# TPU session handshake — unit tests must not touch the TPU tunnel).
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
exec python -m pytest "${@:-tests/}" -q
