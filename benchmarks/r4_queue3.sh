#!/bin/bash
# Round-4 chip queue #3: HBM-capacity attribution for the B=16 regression
# (VERDICT r3 #5). Serial, one chip job at a time (CLAUDE.md).
cd /root/repo
run() {
  name=$1; shift
  echo "$(date +%H:%M:%S) == $name =="
  "$@" > "logs/r4/${name}.log" 2>&1
  echo "$(date +%H:%M:%S) == $name rc=$? =="
}
for c in mem_b8 mem_b16 mem_b32 mem_b16_skipf8 \
         run_b16_donate run_b16_skipf8 run_b16_skipf8_donate run_b8_skipf8; do
  run "hbm16_${c}" timeout 1800 python benchmarks/hbm16.py "$c"
done
echo "$(date +%H:%M:%S) queue3 complete"
