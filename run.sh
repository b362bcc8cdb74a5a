#!/bin/bash
# TPU host launcher — the counterpart of the reference's Slurm script
# (/root/reference/run.sh: 1 node / 1 GPU). On a TPU VM the runtime owns all
# local chips; data parallelism over them is selected with --dp_shards.
#
# usage: ./run.sh "<config.yml> [extra flags...]"
set -euo pipefail
ARGS=${1:-}
exec python main.py --configs ${ARGS}
