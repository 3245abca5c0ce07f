#!/bin/bash
# Round-5 queue 3: ADM-study follow-up cells (3-step crossover + 'auto'
# backend) and the norm+conv v2 kernel probe.
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
export NLC_STUDY_ADM_CELLS="s18_pred_qauto,s10_pred_qauto,s18_base_qauto,s3_base,s3_pred,s3_pred_fast"

for attempt in 1 2 3; do
  gate
  run "study32_adm_f${attempt}" env NLC_STUDY_BUDGET_S=2600 \
    timeout 4300 python benchmarks/study32_adm.py auto
  grep -q "DONE" "logs/r5/study32_adm_f${attempt}.log" && break
done
run "study32_adm_freport" python benchmarks/study32_adm.py report

# norm+conv v2 probe (separate artifact file; v1 rows stay for the record)
for attempt in 1 2; do
  gate
  run "normconv_v2_${attempt}" env \
    NLC_NORMCONV_OUT=benchmarks/measurements/r5/normconv_probe_v2.jsonl \
    timeout 2400 python benchmarks/normconv_probe.py
  grep -q "NORMCONV_DONE" "logs/r5/normconv_v2_${attempt}.log" && break
done
echo "$(date +%H:%M:%S) r5_queue3 complete"
