#!/bin/bash
# Chip job queue #2: waits for the r4 headline session to finish, then runs
# the mxu_bf16 model-level A/Bs and the refreshed SoL probe.  Serialized --
# two concurrent relay clients hang each other.
set -u
cd /root/repo
while ! grep -q "SESSION DONE" results/r4_bench_session.jsonl 2>/dev/null; do
  sleep 30
done
OUT=results/r4_mxu_bf16.jsonl
: > "$OUT"; : > "$OUT.stderr"
run() {
  echo "=== $* ===" | tee -a "$OUT" >/dev/null
  timeout 3600 python bench.py "$@" >> "$OUT" 2>> "$OUT.stderr"
  echo "--- exit $? ---" >> "$OUT"
}
run --model resnet50 --batch 256 --mxu-bf16 1x1
run --model mobilenet_v2 --batch 256 --mxu-bf16 1x1
run --model mobilenet_v1 --batch 256 --mxu-bf16 1x1
run --model resnet18 --batch 1024 --mxu-bf16 1x1
run --model resnet50 --batch 256 --mxu-bf16 eligible
echo "MXU SESSION DONE $(date -u +%H:%M:%S)" >> "$OUT"
timeout 7200 python scripts/r4_sol_probe.py > results/r4_sol_probe.console 2>&1
echo "SOL DONE $(date -u +%H:%M:%S)" >> "$OUT"
