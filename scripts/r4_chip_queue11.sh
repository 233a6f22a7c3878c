#!/bin/bash
set -u
cd /root/repo
while ! grep -q "I8B DONE" results/r4_int8_boundary.jsonl 2>/dev/null; do sleep 30; done
timeout 9000 python scripts/memory_sweep.py resnet18 --batches 1024,2048,4096,8192,16384 --int8-boundary > results/r4_memsweep_r18_i8b.console 2>&1
echo "R18 I8B SWEEP DONE $(date -u +%H:%M:%S)" >> results/r4_memsweep_r18_i8b.console
timeout 9000 python scripts/memory_sweep.py resnet50 --batches 1024,2048,4096 --int8-boundary > results/r4_memsweep_r50_i8b.console 2>&1
echo "R50 I8B SWEEP DONE $(date -u +%H:%M:%S)" >> results/r4_memsweep_r50_i8b.console
