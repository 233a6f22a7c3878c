#!/bin/bash
# Chip job queue #4: after queue3, the per-family attribution ladders
# (VERDICT r3 item 4: give MBv1 and R50 the itemized accounting MBv2 got).
set -u
cd /root/repo
while ! grep -q "MEM DONE" results/r4_queue3.jsonl 2>/dev/null; do
  sleep 30
done
timeout 5400 python scripts/r4_attrib.py resnet50 256 \
  > results/r4_attrib_r50.console 2>&1
echo "ATTRIB R50 DONE $(date -u +%H:%M:%S)" >> results/r4_queue3.jsonl
timeout 5400 python scripts/r4_attrib.py mobilenet_v1 256 \
  > results/r4_attrib_mbv1.console 2>&1
echo "ATTRIB MBV1 DONE $(date -u +%H:%M:%S)" >> results/r4_queue3.jsonl
