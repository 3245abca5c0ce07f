#!/bin/bash
# Round-3 chip queue: waits for the 32^2 study loop to finish, then runs
# the queued chip jobs serially (CLAUDE.md: never two chip jobs at once,
# never kill one mid-compile). Each job's output goes to logs/r3/.
cd /root/repo
while kill -0 "$(cat /tmp/study_loop.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "$(date +%H:%M:%S) study loop exited; starting queue"
run() {
  name=$1; shift
  echo "$(date +%H:%M:%S) == $name =="
  "$@" > "logs/r3/${name}.log" 2>&1
  echo "$(date +%H:%M:%S) == $name rc=$? =="
}
run floorprobe python benchmarks/floorprobe.py
run attn_bwd python benchmarks/attn_bwd_train.py
run input_wait python benchmarks/input_wait_bench.py
echo "$(date +%H:%M:%S) queue complete"
