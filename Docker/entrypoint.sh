#!/bin/bash
# Entry point: run one named benchmark (reference: Docker/entrypoint.sh,
# which clones ABC and delegates to run_all.sh). Results land in /out
# (mount a volume) using the reference CSV schema.
set -euo pipefail
exec /abc_tpu/Docker/run_all.sh "$@"
