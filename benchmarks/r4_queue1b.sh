#!/bin/bash
# Round-4 chip queue #1b: validate the fused GroupNorm epilogue on the real
# TPU, then re-measure the flagship cells with fusion live (the original
# queue1 bf16/style_base cells died on the pre-fix Pallas lowering bug).
# Serial, one chip job at a time (CLAUDE.md).
cd /root/repo
run() {
  name=$1; shift
  echo "$(date +%H:%M:%S) == $name =="
  "$@" > "logs/r4/${name}.log" 2>&1
  rc=$?
  echo "$(date +%H:%M:%S) == $name rc=$rc =="
  return $rc
}
run fusedprobe timeout 1200 python benchmarks/fusedprobe.py || {
  echo "fusedprobe FAILED - aborting queue1b"; exit 1; }
export NLC_STEPPARTS_TAG=fused
for cell in baseline bf16 style_base bf16_no_all; do
  run "stepparts_fused_${cell}" timeout 1800 python benchmarks/stepparts.py "$cell"
done
unset NLC_STEPPARTS_TAG
run bench_fused timeout 2400 python bench.py
echo "$(date +%H:%M:%S) queue1b complete"
