#!/bin/bash
# Round-5 queue 2: the ADM-family NLC study (VERDICT r4 #3) on the chip.
# Stages are idempotent/resumable; budget 2600 + longest unit << 4300.
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

export NLC_STUDY_ADM_KIMG=300
export NLC_STUDY_ADM_HEAD_EPOCHS=16

for attempt in 1 2 3 4 5 6; do
  gate
  run "study32_adm_${attempt}" env NLC_STUDY_BUDGET_S=2600 \
    timeout 4300 python benchmarks/study32_adm.py auto
  grep -q "DONE" "logs/r5/study32_adm_${attempt}.log" && break
done
run "study32_adm_report" python benchmarks/study32_adm.py report
echo "$(date +%H:%M:%S) r5_queue2 complete"
