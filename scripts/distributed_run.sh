#!/usr/bin/env bash
# Multi-host launch (the analog of the reference's distributed_run.sh).
# TPU-native model: ONE process per host (not per chip); jax.distributed
# autodetects the slice topology on Cloud TPU.  For manual clusters set:
#   COORDINATOR_ADDRESS=host0:port NUM_PROCESSES=N PROCESS_ID=i
#
#   bash scripts/distributed_run.sh <config.yml> <global_batch_size>
set -euo pipefail
CFG=${1:?usage: distributed_run.sh <config.yml> <global_batch_size>}
BS=${2:?usage: distributed_run.sh <config.yml> <global_batch_size>}
export F8NET_DISTRIBUTED=1
exec python -m f8net_tpu.run "app:${CFG}" "bs:${BS}"
