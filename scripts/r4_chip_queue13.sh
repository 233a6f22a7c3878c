#!/bin/bash
# queue13: after queue12's MBv2 i8b sweep, serving ladder top rung (indicative, link-bound).
set -u
cd /root/repo
# bounded wait (ADVICE r4): if queue12 dies before writing its sentinel,
# give up after 90 min instead of holding the chip-queue slot forever
for i in $(seq 270); do
  grep -q "MBV2 I8B SWEEP DONE" results/r4_memsweep_mbv2_i8b.console 2>/dev/null && break
  sleep 20
  [ "$i" -eq 270 ] && { echo "queue13: sentinel never appeared, aborting" >&2; exit 1; }
done
timeout 3000 python scripts/serving_bench.py resnet18 64 16 100 relaxed8 > results/r4_serving_relaxed8.console 2>&1
echo "SERVING RELAXED8 DONE $(date -u +%H:%M:%S)" >> results/r4_serving_relaxed8.console
