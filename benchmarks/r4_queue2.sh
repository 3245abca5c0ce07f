#!/bin/bash
# Round-4 chip queue #2: the unmeasured BASELINE.json workloads
# (VERDICT r3 #2). Serial, one chip job at a time (CLAUDE.md).
cd /root/repo
run() {
  name=$1; shift
  echo "$(date +%H:%M:%S) == $name =="
  "$@" > "logs/r4/${name}.log" 2>&1
  echo "$(date +%H:%M:%S) == $name rc=$? =="
}
for cell in celeba64 celeba64_b64 edm64_18 edm64_40 edm64_dhariwal \
            const_none const_sr4 const_inp const_deblur const_color const_cs \
            sigma_train; do
  run "workloads_${cell}" timeout 1800 python benchmarks/workloads.py "$cell"
done
echo "$(date +%H:%M:%S) queue2 complete"
