#!/bin/bash
# Chip job queue #5: after the attribution ladders, the UNCONFOUNDED
# border-bias A/B (r2 measured it only in combination with s2d) on the
# pad-heavy ResNets -- the one glue element that is an execution form,
# not contract.
set -u
cd /root/repo
while ! grep -q "ATTRIB MBV1 DONE" results/r4_queue3.jsonl 2>/dev/null; do
  sleep 30
done
OUT=results/r4_queue5.jsonl
: > "$OUT"; : > "$OUT.stderr"
run() {
  echo "=== $* ===" | tee -a "$OUT" >/dev/null
  timeout 3600 python bench.py "$@" >> "$OUT" 2>> "$OUT.stderr"
  echo "--- exit $? ---" >> "$OUT"
}
run --model resnet50 --batch 256 --border-bias
run --model resnet18 --batch 1024 --border-bias
echo "Q5 DONE $(date -u +%H:%M:%S)" >> "$OUT"
