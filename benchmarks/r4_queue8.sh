#!/bin/bash
# Round-4 queue 8: after queue7 finishes (bench cell + study64 to DONE),
# run the norm-chain achieved-bandwidth probe (benchmarks/normbw.py) —
# the last open question from the non-conv itemization: is the ~80 ms
# norm bucket at the memory floor, or does the chain run far under
# achievable bandwidth? Resumable (normbw skips recorded cells).
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

Q7=$(cat /tmp/r4queue7.pid 2>/dev/null)
while [ -n "$Q7" ] && kill -0 "$Q7" 2>/dev/null; do
  sleep 30
done
echo "$(date +%H:%M:%S) queue7 exited"

for attempt in 1 2 3; do
  run "normbw_a${attempt}" timeout 3600 python benchmarks/normbw.py
  grep -q "NORMBW_DONE" "logs/r4/normbw_a${attempt}.log" && break
done

echo "$(date +%H:%M:%S) r4_queue8 complete"
