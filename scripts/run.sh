#!/usr/bin/env bash
# Single-host launch (the analog of the reference's run.sh):
#   bash scripts/run.sh <config.yml> <batch_size>
set -euo pipefail
CFG=${1:?usage: run.sh <config.yml> <batch_size>}
BS=${2:?usage: run.sh <config.yml> <batch_size>}
exec python -m f8net_tpu.run "app:${CFG}" "bs:${BS}"
