#!/bin/bash
# Round-4 queue 15 (post third re-image): finish the two tail items.
#   1. flagsweep `nolhs` — the one sweep cell the tunnel drop ate (timing-
#      sensitive: runs FIRST, while the host is otherwise idle).
#   2. study64 int8-isolation cells on a fresh reduced-budget model (the
#      re-image erased the 400-kimg model; NLC_STUDY64_KIMG=128 retrain with
#      all four compared cells fresh → internal controls stay valid).
# Serial, health-gated before every chip stage (a wedge costs one timeout).
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
gate() {
  until timeout 150 python benchmarks/probe_chip.py > logs/r4/probe_last.log 2>&1; do
    echo "$(date +%H:%M:%S) plane wedged - sleeping 300s"
    sleep 300
  done
  echo "$(date +%H:%M:%S) plane healthy"
}

export NLC_STUDY64_KIMG=128
export NLC_STUDY64_HEAD_EPOCHS=16
export NLC_STUDY64_CELLS="s18_base-base,s18_base-base_qconv,s18_pred_partial-pred,s18_pred_partial-pred_qconv,s10_base-base,s10_base-base_qconv,s10_pred_partial-pred,s10_pred_partial-pred_qconv"

gate
run "flagsweep_nolhs" timeout 900 python benchmarks/flagsweep.py nolhs

# outer timeout 4300 >> budget 2600 + longest unit (~1100 s): the internal
# clean exit, never the SIGTERM, ends the process (ADVICE r4 — an outer
# SIGTERM mid-compile has wedged the tunneled plane three times)
for attempt in 1 2 3 4; do
  gate
  run "study64_q15_${attempt}" env NLC_STUDY_BUDGET_S=2600 \
    timeout 4300 python benchmarks/study64.py auto
  grep -q "DONE" "logs/r4/study64_q15_${attempt}.log" && break
done

run "study64_q15_report" python benchmarks/study64.py report
echo "$(date +%H:%M:%S) r4_queue15 complete"
