#!/bin/bash
# Round-5 queue 6: re-sample the 12 head-dependent ADM-study cells with the
# CORRECT 16-epoch sigma head (the --load_folder bug routed head chunk 2
# into run dir 1 while the sweep read dir 0's 8-epoch head; the base-style
# cells never touch the head and stand). Half-head cells quarantined in
# study32_adm/sweep_head8/.
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
export NLC_STUDY_ADM_CELLS="s3_pred,s18_pred,s10_pred,s5_pred,s18_pred_qauto,s10_pred_qauto,s18_pred_qconv,s10_pred_qconv,s3_pred_fast,s18_pred_fast,s10_pred_fast,s5_pred_fast"

for attempt in 1 2 3; do
  gate
  run "study32_adm_h16_${attempt}" env NLC_STUDY_BUDGET_S=2600 \
    timeout 4300 python benchmarks/study32_adm.py auto
  grep -q "DONE" "logs/r5/study32_adm_h16_${attempt}.log" && break
done
run "study32_adm_h16_report" python benchmarks/study32_adm.py report
echo "$(date +%H:%M:%S) r5_queue6 complete"
