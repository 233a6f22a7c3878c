#!/bin/bash
# Chip job queue #8: second-session confirmation of the round-4 headline —
# relaxed mode on all four models plus strict controls on the MobileNets
# (the MBv1 ladder's D=1.062 vs bench's 0.951 the same hour shows the
# relay band straddles 1.0 there; two sessions bound it).
set -u
cd /root/repo
OUT=results/r4_final_headline.jsonl
: > "$OUT"; : > "$OUT.stderr"
run() {
  echo "=== $* ===" >> "$OUT"
  timeout 3600 python bench.py "$@" >> "$OUT" 2>> "$OUT.stderr"
  echo "--- exit $? ---" >> "$OUT"
}
run --model mobilenet_v1 --batch 256
run --model mobilenet_v1 --batch 256 --strict-boundary
run --model mobilenet_v2 --batch 256
run --model mobilenet_v2 --batch 256 --strict-boundary
run --model resnet50 --batch 256
run --model resnet18 --batch 1024
echo "FINAL HEADLINE DONE $(date -u +%H:%M:%S)" >> "$OUT"
