#!/bin/bash
# Round-3 chip queue, part 4: the pred_fast boundary-bisection study cells
# (study32.py sweep re-entry only runs cells without a results.json), then
# the full CPU test suite once the chip timing work is all done.
cd /root/repo
while kill -0 "$(cat /tmp/queue3.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "$(date +%H:%M:%S) queue 3 exited; starting queue 4"
run() {
  name=$1; shift
  echo "$(date +%H:%M:%S) == $name =="
  "$@" > "logs/r3/${name}.log" 2>&1
  echo "$(date +%H:%M:%S) == $name rc=$? =="
  sleep 30
}
export NLC_STUDY_DIR=/root/repo/study32
run study_boundary python benchmarks/study32.py auto
echo "$(date +%H:%M:%S) queue 4 complete"
