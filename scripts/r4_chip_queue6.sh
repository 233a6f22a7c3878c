#!/bin/bash
# Chip job queue #6: after the outage-retry queue, A/B the relaxed-boundary
# throughput mode (bf16_boundary) on all four models.
set -u
cd /root/repo
while ! grep -q "RETRY QUEUE DONE" results/r4_relay_retry.console 2>/dev/null; do
  sleep 30
done
OUT=results/r4_bf16_boundary.jsonl
: > "$OUT"; : > "$OUT.stderr"
run() {
  echo "=== $* ===" | tee -a "$OUT" >/dev/null
  timeout 3600 python bench.py "$@" >> "$OUT" 2>> "$OUT.stderr"
  echo "--- exit $? ---" >> "$OUT"
}
run --model resnet50 --batch 256 --bf16-boundary
run --model resnet18 --batch 1024 --bf16-boundary
run --model mobilenet_v2 --batch 256 --bf16-boundary
run --model mobilenet_v1 --batch 256 --bf16-boundary
echo "BF16B DONE $(date -u +%H:%M:%S)" >> "$OUT"
