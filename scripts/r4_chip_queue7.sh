#!/bin/bash
# Chip job queue #7: final MBv1 attribution-ladder retry (two prior
# attempts hung in a single remote compile), after the bf16_boundary A/Bs.
set -u
cd /root/repo
while ! grep -q "BF16B DONE" results/r4_bf16_boundary.jsonl 2>/dev/null; do
  sleep 30
done
timeout 4200 python scripts/r4_attrib.py mobilenet_v1 256 \
  > results/r4_attrib_mbv1.console 2>&1
echo "ATTRIB MBV1 FINAL $(date -u +%H:%M:%S) exit=$?" >> results/r4_queue3.jsonl
