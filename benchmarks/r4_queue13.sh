#!/bin/bash
# Round-4 queue 13: XLA compiler-options sweep (benchmarks/flagsweep.py)
# after queue 12 drains. Timing cells — must run with the chip otherwise
# idle and no concurrent host CPU work. Health-gate before every cell.
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

# wait for queue 12 (study64 + bench) to finish
Q12=${NLC_Q13_WAIT_PID:-}
if [ -n "$Q12" ]; then
  while kill -0 "$Q12" 2>/dev/null; do sleep 60; done
  echo "$(date +%H:%M:%S) queue 12 drained"
fi

for cell in baseline vmem32 vmem64 vmem96 nolhs; do
  gate
  run "flagsweep_${cell}" timeout 1800 python benchmarks/flagsweep.py "$cell"
done

echo "$(date +%H:%M:%S) r4_queue13 complete"
