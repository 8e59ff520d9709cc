#!/usr/bin/env bash
# Run the test suite on a virtual 8-device CPU mesh, bypassing the axon
# remote-TPU sitecustomize that this container pins JAX to.
set -euo pipefail
cd "$(dirname "$0")/.."
if [ "$#" -eq 0 ]; then set -- -x -q; fi
PYTHONPATH= JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  MEMOTR_TEST_REEXEC=1 \
  python -m pytest tests/ "$@"
