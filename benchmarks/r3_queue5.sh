#!/bin/bash
# Round-3 chip queue, part 5: the 4-row input-wait matrix with the uint8
# on-device-normalize rows, measured with NOTHING else on the host CPU
# (the first input_wait run was polluted by a concurrent CPU rehearsal —
# CLAUDE.md gains a note).
cd /root/repo
while kill -0 "$(cat /tmp/queue4.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "$(date +%H:%M:%S) queue 4 exited; starting queue 5"
echo "$(date +%H:%M:%S) == input_wait3 =="
python benchmarks/input_wait_bench.py > logs/r3/input_wait3.log 2>&1
echo "$(date +%H:%M:%S) == input_wait3 rc=$? =="
echo "$(date +%H:%M:%S) queue 5 complete"
