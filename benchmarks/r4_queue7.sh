#!/bin/bash
# Round-4 queue 7: one bonus bench cell between queue6's bench re-capture
# and study64, using the study64/DEFER pause point (same pattern that
# paused the master queue). Sequence:
#   1. wait for queue6's bench_fused_v2 to finish, re-plant DEFER at once
#      (if the race is lost, at most one study64 attempt runs a real
#      stage before the next attempt defers — stages are resumable)
#   2. wait for queue6 to exit (its deferred attempts are ~2 s no-ops)
#   3. capture the pred_fast + int8 + fused extension row
#   4. un-defer and drive study64 to DONE
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

while ! grep -q "== bench_fused_v2 rc=" logs/r4/queue6.log 2>/dev/null; do
  sleep 5
done
touch study64/DEFER
echo "$(date +%H:%M:%S) DEFER re-planted"

Q6=$(cat /tmp/r4queue6.pid 2>/dev/null)
while [ -n "$Q6" ] && kill -0 "$Q6" 2>/dev/null; do
  sleep 15
done
echo "$(date +%H:%M:%S) queue6 exited"

run bench_predfast_int8 env NLC_BENCH_STYLE=pred_fast timeout 2400 python bench.py

rm -f study64/DEFER
for attempt in 1 2 3 4 5 6 7 8 9 10; do
  run "study64_c${attempt}" timeout 5400 python benchmarks/study64.py auto
  grep -q "DONE" "logs/r4/study64_c${attempt}.log" && break
done

echo "$(date +%H:%M:%S) r4_queue7 complete"
