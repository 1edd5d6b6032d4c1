#!/bin/bash
# Hermetic CPU test runner: unset the axon-tunnel env so sitecustomize never
# registers the TPU PJRT plugin (a single-client tunnel; concurrent processes
# block on it), and force the CPU platform with 8 virtual devices.
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -m pytest "${@:-tests/}" -q
