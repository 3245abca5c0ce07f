#!/bin/bash
# Round-5 queue 5 (final captures): refresh the pred_fast+int8-auto
# extension row on the healthy plane, then a last default-config bench
# sanity so the driver's round-close capture starts from a known-good
# state. Margins per ADVICE r4 (outer timeout > NLC_BENCH_DEADLINE).
cd /root/repo
mkdir -p logs/r5 benchmarks/measurements/r5
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

gate
run "bench_predfast_r5" env NLC_BENCH_STYLE=pred_fast timeout 3000 python bench.py
grep -o '{.*}' logs/r5/bench_predfast_r5.log | tail -1 \
  > benchmarks/measurements/r5/bench_predfast_auto.json

gate
run "bench_final_r5" timeout 3000 python bench.py
grep -o '{.*}' logs/r5/bench_final_r5.log | tail -1 \
  > benchmarks/measurements/r5/bench_default_final.json
echo "$(date +%H:%M:%S) r5_queue5 complete"
