#!/bin/bash
# Relay outage recovery: poll the tunnel with a tiny matmul; when it
# answers, re-run the MBv1 attribution ladder (killed mid-outage), then
# re-run any queue5 border-bias rows that failed during the outage.
set -u
cd /root/repo
probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); float((x@x).sum())
" > /dev/null 2>&1
}
until probe; do sleep 240; done
echo "relay back $(date -u +%H:%M:%S)"
timeout 5400 python scripts/r4_attrib.py mobilenet_v1 256 \
  > results/r4_attrib_mbv1.console 2>&1
echo "ATTRIB MBV1 RETRY DONE $(date -u +%H:%M:%S)"
# re-run border-bias rows if queue5 produced no metric lines for them
for spec in "resnet50 256" "resnet18 1024"; do
  set -- $spec
  if ! grep -q "${1}_int8" results/r4_queue5.jsonl 2>/dev/null; then
    echo "=== retry --model $1 --batch $2 --border-bias ===" >> results/r4_queue5.jsonl
    timeout 3600 python bench.py --model "$1" --batch "$2" --border-bias \
      >> results/r4_queue5.jsonl 2>> results/r4_queue5.jsonl.stderr
    echo "--- exit $? ---" >> results/r4_queue5.jsonl
  fi
done
echo "RETRY QUEUE DONE $(date -u +%H:%M:%S)"
