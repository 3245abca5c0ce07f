#!/bin/bash
# Round-4 master chip queue: chains the remaining chip work so an API-side
# session drop cannot stall the round (two prior sessions died mid-queue).
# Serial, one chip job at a time (CLAUDE.md). Everything is resumable:
# fusedprobe skips validated cells, stepparts/workloads/hbm16 append one
# JSON line per completed cell, study64 is staged ('auto' until DONE).
cd /root/repo
mkdir -p logs/r4
run() {
  name=$1; shift
  echo "$(date +%H:%M:%S) == $name =="
  "$@" > "logs/r4/${name}.log" 2>&1
  rc=$?
  echo "$(date +%H:%M:%S) == $name rc=$rc =="
  return $rc
}

# -- queue 1b: fused-epilogue validation, fused stepparts cells, bench -------
ok=1
for attempt in 1 2 3; do
  run "fusedprobe_a${attempt}" timeout 2400 python benchmarks/fusedprobe.py \
    && { ok=0; break; }
done
if [ $ok -ne 0 ]; then
  echo "fusedprobe did not finish after 3 attempts - skipping fused cells"
else
  export NLC_STEPPARTS_TAG=fused
  for cell in baseline bf16 style_base bf16_no_all; do
    run "stepparts_fused_${cell}" timeout 1800 python benchmarks/stepparts.py "$cell"
  done
  unset NLC_STEPPARTS_TAG
  run bench_fused timeout 2400 python bench.py
fi

# -- queue 2: the unmeasured BASELINE.json workloads (VERDICT r3 #2) ---------
for cell in celeba64 celeba64_b64 edm64_18 edm64_40 edm64_dhariwal \
            const_none const_sr4 const_inp const_deblur const_color const_cs \
            sigma_train; do
  run "workloads_${cell}" timeout 1800 python benchmarks/workloads.py "$cell"
done

# -- queue 3: HBM-capacity attribution for the B=16 regression (r3 #5) -------
for c in mem_b8 mem_b16 mem_b32 mem_b16_skipf8 \
         run_b16_donate run_b16_skipf8 run_b16_skipf8_donate run_b8_skipf8; do
  run "hbm16_${c}" timeout 1800 python benchmarks/hbm16.py "$c"
done

# -- study64: pred_fast boundary at a second spatial scale (r3 #6) -----------
for attempt in 1 2 3 4 5 6 7 8; do
  run "study64_a${attempt}" timeout 5400 python benchmarks/study64.py auto
  grep -q "DONE" "logs/r4/study64_a${attempt}.log" && break
done

echo "$(date +%H:%M:%S) r4_master complete"
