#!/bin/bash
# CPU test runner: strip the axon TPU relay hook (sitecustomize dials the
# tunnel in every python process) and force the CPU platform.
if [ $# -eq 0 ]; then set -- tests/ -q; fi
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest "$@"
