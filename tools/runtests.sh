#!/bin/bash
# Hermetic CPU test runner: unset the axon-tunnel env so sitecustomize never
# registers the TPU PJRT plugin (a single-client tunnel; concurrent processes
# block on it), and force the CPU platform with 8 virtual devices.
#
# NOTE: when checking results from a pipeline, read ${PIPESTATUS[0]} — the
# pipeline's own exit code is the last command's (e.g. tail's). pytest's
# "N passed" summary line prints even with -q; don't pass -q twice (doubled
# -q suppresses it, which once hid a failing test behind a tail'd pipe).
if [ $# -eq 0 ]; then
    set -- tests/ -q
fi
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest "$@"
