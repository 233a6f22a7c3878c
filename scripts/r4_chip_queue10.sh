#!/bin/bash
set -u
cd /root/repo
OUT=results/r4_int8_boundary.jsonl
: > "$OUT"; : > "$OUT.stderr"
run() {
  echo "=== $* ===" >> "$OUT"
  timeout 3600 python bench.py "$@" >> "$OUT" 2>> "$OUT.stderr"
  echo "--- exit $? ---" >> "$OUT"
}
run --model resnet50 --batch 256 --int8-boundary
run --model resnet18 --batch 1024 --int8-boundary
run --model mobilenet_v2 --batch 256 --int8-boundary
run --model resnet50 --batch 2048 --int8-boundary
echo "I8B DONE $(date -u +%H:%M:%S)" >> "$OUT"
