#!/bin/bash
# queue12 (r4 third session): driver-default bench receipt + MBv2 int8-boundary sweep.
set -u
cd /root/repo
timeout 3600 python bench.py > results/r4_q12_bench_default.console 2>&1
echo "BENCH DEFAULT DONE $(date -u +%H:%M:%S)" >> results/r4_q12_bench_default.console
timeout 5400 python scripts/memory_sweep.py mobilenet_v2 --batches 256,1024,2048,4096 --int8-boundary > results/r4_memsweep_mbv2_i8b.console 2>&1
echo "MBV2 I8B SWEEP DONE $(date -u +%H:%M:%S)" >> results/r4_memsweep_mbv2_i8b.console
