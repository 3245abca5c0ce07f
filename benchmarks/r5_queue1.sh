#!/bin/bash
# Round-5 queue 1: finish the study64 cells, stamp the isolation artifact,
# re-capture the driver bench on a healthy plane, run the norm+conv fusion
# probe. Serial, health-gated before every chip stage; budget margins per
# ADVICE r4 (internal budget + longest unit stays well inside the outer
# timeout, so the clean exit — never the SIGTERM — ends each process).
cd /root/repo
mkdir -p logs/r5
run() {
  name=$1; shift
  echo "$(date +%H:%M:%S) == $name =="
  "$@" > "logs/r5/${name}.log" 2>&1
  rc=$?
  echo "$(date +%H:%M:%S) == $name rc=$rc =="
  return $rc
}
gate() {
  until timeout 150 python benchmarks/probe_chip.py > logs/r5/probe_last.log 2>&1; do
    echo "$(date +%H:%M:%S) plane wedged - sleeping 300s"
    sleep 300
  done
  echo "$(date +%H:%M:%S) plane healthy"
}

export NLC_STUDY64_KIMG=128
export NLC_STUDY64_HEAD_EPOCHS=16
# isolation cells first (highest value), then the few-step crossover cells
export NLC_STUDY64_CELLS="s18_base-base,s18_base-base_qconv,s18_pred_partial-pred,s18_pred_partial-pred_qconv,s10_base-base,s10_base-base_qconv,s10_pred_partial-pred,s10_pred_partial-pred_qconv,s18_pred_partial-pred_qauto,s10_pred_partial-pred_qauto,s5_base-base,s5_pred_partial-pred,s3_base-base,s3_pred_partial-pred"

# 1. study64 sweep: budget 2600 + longest unit ~1100 << timeout 4300
for attempt in 1 2 3 4 5 6; do
  gate
  run "study64_r5_${attempt}" env NLC_STUDY_BUDGET_S=2600 \
    timeout 4300 python benchmarks/study64.py auto
  grep -q "DONE" "logs/r5/study64_r5_${attempt}.log" && break
done
run "study64_report" python benchmarks/study64.py report
run "study64_isolation_stamp" env NLC_STUDY64_HEAD_EPOCHS=16 \
  python benchmarks/study64_summarize.py

# 2. driver-style bench re-capture with the default config (outer timeout
# 3000 > NLC_BENCH_DEADLINE 2700 so bench.py's own watchdog — which always
# prints a parseable line — ends the process, never the SIGTERM)
gate
mkdir -p benchmarks/measurements/r5
run "bench_default_r5" timeout 3000 python bench.py
grep -o '{.*}' logs/r5/bench_default_r5.log | tail -1 \
  > benchmarks/measurements/r5/bench_default.json

# 3. norm+conv fusion probe (both shapes, resumable)
for attempt in 1 2; do
  gate
  run "normconv_probe_${attempt}" timeout 2400 python benchmarks/normconv_probe.py
  grep -q "NORMCONV_DONE" "logs/r5/normconv_probe_${attempt}.log" && break
done
echo "$(date +%H:%M:%S) r5_queue1 complete"
