#!/bin/bash
# r5 queue1: MBv2 attribution ladder (shipping engine) -> SoL deviation
# controls (E14p128/E7p128/P56c256) -> interleaved serving A/B.
# Sequential: two concurrent bench clients hang each other (CLAUDE.md).
set -u
cd /root/repo
echo "QUEUE1 START $(date -u +%H:%M:%S)"
timeout 5400 python scripts/r4_attrib.py mobilenet_v2 256 > results/r5_attrib_mbv2.console 2>&1
echo "MBV2 ATTRIB DONE $(date -u +%H:%M:%S) rc=$?"
timeout 5400 python scripts/r4_sol_probe.py --classes E14,E7,P56,E14p128,E7p128,P56c256 \
  --variants s8_f32rq,bf16 --out results/r5_sol_deviation.jsonl > results/r5_sol_deviation.console 2>&1
echo "SOL DEVIATION DONE $(date -u +%H:%M:%S) rc=$?"
timeout 5400 python scripts/serving_bench.py resnet18 64 16 50 interleave 5 > results/r5_serving_interleave.console 2>&1
echo "SERVING INTERLEAVE DONE $(date -u +%H:%M:%S) rc=$?"
