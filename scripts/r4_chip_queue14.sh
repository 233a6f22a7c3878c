#!/bin/bash
# queue14: second-session confirmation of the int8-boundary headline A/Bs.
set -u
cd /root/repo
timeout 3000 python bench.py --int8-boundary > results/r4_q14_r18_i8b.console 2>&1
echo "R18 I8B CONFIRM DONE $(date -u +%H:%M:%S)" >> results/r4_q14_r18_i8b.console
timeout 3000 python bench.py --model resnet50 --batch 256 --int8-boundary > results/r4_q14_r50_i8b.console 2>&1
echo "R50 I8B CONFIRM DONE $(date -u +%H:%M:%S)" >> results/r4_q14_r50_i8b.console
