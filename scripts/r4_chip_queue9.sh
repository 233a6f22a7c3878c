#!/bin/bash
# Chip job queue #9: border_bias on the MobileNets (never A/B'd there —
# queue5 covered the ResNets only).  Every MBv1/MBv2 depthwise conv pays
# an explicit -128 pad copy of its activation; border_bias replaces that
# with conv-internal zero padding + a position-dependent bias map
# (bit-exact, CPU-verified incl. composed with the relaxed mode).
set -u
cd /root/repo
while ! grep -q "FINAL HEADLINE DONE" results/r4_final_headline.jsonl 2>/dev/null; do
  sleep 30
done
OUT=results/r4_bb_mobilenets.jsonl
: > "$OUT"; : > "$OUT.stderr"
run() {
  echo "=== $* ===" >> "$OUT"
  timeout 3600 python bench.py "$@" >> "$OUT" 2>> "$OUT.stderr"
  echo "--- exit $? ---" >> "$OUT"
}
# relaxed default on both; the queue8 plain rows are the same-hour controls
run --model mobilenet_v1 --batch 256 --border-bias
run --model mobilenet_v2 --batch 256 --border-bias
echo "BB MOBILENETS DONE $(date -u +%H:%M:%S)" >> "$OUT"
