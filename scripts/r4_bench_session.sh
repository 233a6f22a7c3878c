#!/bin/bash
# Round-4 headline session: re-measure the zoo with the saturation-aware
# f32-requant eligibility engaged (landed 6f6afd9, never benchmarked), plus
# the --no-f32-requant control on the model it targets (ResNet50).
# Serialized: two concurrent clients hang the relay (CLAUDE.md).
set -u
cd /root/repo
OUT=results/r4_bench_session.jsonl
: > "$OUT"; : > "$OUT.stderr"
run() {
  echo "=== $* ===" | tee -a "$OUT" "$OUT.stderr" >/dev/null
  timeout 3600 python bench.py "$@" >> "$OUT" 2>> "$OUT.stderr"
  echo "--- exit $? ---" >> "$OUT"
}
run --model resnet50 --batch 256
run --model resnet50 --batch 256 --no-f32-requant
run --model mobilenet_v1 --batch 256
run --model mobilenet_v2 --batch 256
run --model resnet18 --batch 1024
echo "SESSION DONE $(date -u +%H:%M:%S)" >> "$OUT"
