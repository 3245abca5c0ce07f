#!/bin/bash
# Round-5 queue 4: the sharpness hypothesis. The r4 400-kimg study64 model
# measured +6-7% FID for int8-conv (no internal controls; model erased);
# the r5 128-kimg model measured +0.7-1.4% and the sharp ADM-32 +2.7-3.4%
# (conv) / -3.2% (auto). Resume the committed 128-kimg training state to
# 400 kimg in a SEPARATE study dir and run the full isolation grid (conv
# AND auto, base AND pred) on the sharp model — single-model controls this
# time.
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

S=/root/repo/study64
S4=/root/repo/study64_400
if [ ! -d "$S4/edm" ]; then
  mkdir -p "$S4/edm"
  cp -r "$S/data" "$S4/data"
  cp "$S/fid.npz" "$S/norm.json" "$S4/"
  cp -r "$S/edm/training-state-000128" "$S4/edm/" 2>/dev/null \
    || cp -r "$S/edm/"training-state-0001* "$S4/edm/"
fi

export NLC_STUDY64_DIR=$S4
export NLC_STUDY64_KIMG=400
export NLC_STUDY64_HEAD_EPOCHS=16
export NLC_STUDY64_CELLS="s18_pred_partial-pred,s18_pred_partial-pred_qconv,s18_pred_partial-pred_qauto,s18_base-base,s18_base-base_qconv,s10_pred_partial-pred,s10_pred_partial-pred_qconv,s10_pred_partial-pred_qauto,s10_base-base,s10_base-base_qconv"

for attempt in 1 2 3 4 5 6; do
  gate
  run "study64s_${attempt}" env NLC_STUDY_BUDGET_S=2600 \
    timeout 4300 python benchmarks/study64.py auto
  grep -q "DONE" "logs/r5/study64s_${attempt}.log" && break
done
run "study64s_report" python benchmarks/study64.py report
run "study64s_stamp" env NLC_STUDY64_HEAD_EPOCHS=16 python \
  benchmarks/study64_summarize.py \
  benchmarks/measurements/r5/study64_sharp_isolation.json
echo "$(date +%H:%M:%S) r5_queue4 complete"
