#!/bin/bash
# queue13: after queue12's MBv2 i8b sweep, serving ladder top rung (indicative, link-bound).
set -u
cd /root/repo
while ! grep -q "MBV2 I8B SWEEP DONE" results/r4_memsweep_mbv2_i8b.console 2>/dev/null; do sleep 20; done
timeout 3000 python scripts/serving_bench.py resnet18 64 16 100 relaxed8 > results/r4_serving_relaxed8.console 2>&1
echo "SERVING RELAXED8 DONE $(date -u +%H:%M:%S)" >> results/r4_serving_relaxed8.console
