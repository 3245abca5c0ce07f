#!/bin/bash
# Round-4 queue 14: study64 int8 follow-up cells (base-style int8 isolates
# raw quant drift from NLC-loop interaction) after queue 13's flagsweep.
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
  until timeout 150 python /tmp/q12probe.py > logs/r4/probe_last.log 2>&1; do
    echo "$(date +%H:%M:%S) plane wedged — sleeping 300s"
    sleep 300
  done
  echo "$(date +%H:%M:%S) plane healthy"
}

Q13=${NLC_Q14_WAIT_PID:-}
if [ -n "$Q13" ]; then
  while kill -0 "$Q13" 2>/dev/null; do sleep 60; done
  echo "$(date +%H:%M:%S) queue 13 drained"
fi

for attempt in 1 2 3; do
  gate
  run "study64_q14_${attempt}" timeout 5400 python benchmarks/study64.py auto
  grep -q "DONE" "logs/r4/study64_q14_${attempt}.log" && break
done

echo "$(date +%H:%M:%S) r4_queue14 complete"
