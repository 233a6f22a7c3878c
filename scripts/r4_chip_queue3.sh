#!/bin/bash
# Chip job queue #3: after queue2 (mxu A/Bs + SoL probe), retry the MBv2
# headline (queue1's run died to a relay-side compile crash), then the
# QAT-vs-plain training ratio and the memory-sweep refresh.
set -u
cd /root/repo
while ! grep -q "SOL DONE" results/r4_mxu_bf16.jsonl 2>/dev/null; do
  sleep 30
done
OUT=results/r4_queue3.jsonl
: > "$OUT"; : > "$OUT.stderr"
run() {
  echo "=== $* ===" | tee -a "$OUT" >/dev/null
  timeout 3600 python bench.py "$@" >> "$OUT" 2>> "$OUT.stderr"
  echo "--- exit $? ---" >> "$OUT"
}
run --model mobilenet_v2 --batch 256
echo "MBV2 RETRY DONE" >> "$OUT"
timeout 5400 python scripts/train_qat_vs_plain.py 256 \
  > results/r4_train_qat_vs_plain.console 2>&1
echo "QAT DONE $(date -u +%H:%M:%S)" >> "$OUT"
timeout 5400 python scripts/memory_sweep.py resnet18 \
  > results/r4_memory_sweep_r18.console 2>&1
echo "MEM R18 DONE $(date -u +%H:%M:%S)" >> "$OUT"
timeout 5400 python scripts/memory_sweep.py mobilenet_v2 \
  --batches 256,1024,2048 \
  > results/r4_memory_sweep_mbv2.console 2>&1
echo "MEM DONE $(date -u +%H:%M:%S)" >> "$OUT"
