#!/bin/bash
# Round-4 chip queue #1: itemize the flagship step's non-conv bucket
# (VERDICT r3 #1 phase 1). Serial, one chip job at a time (CLAUDE.md).
cd /root/repo
run() {
  name=$1; shift
  echo "$(date +%H:%M:%S) == $name =="
  "$@" > "logs/r4/${name}.log" 2>&1
  echo "$(date +%H:%M:%S) == $name rc=$? =="
}
for cfg in baseline no_norm no_swish no_attn static_ascale no_all style_base \
           bf16 bf16_no_norm bf16_no_swish bf16_no_attn bf16_no_all bf16_base; do
  run "stepparts_${cfg}" timeout 1500 python benchmarks/stepparts.py "$cfg"
done
echo "$(date +%H:%M:%S) queue complete"
