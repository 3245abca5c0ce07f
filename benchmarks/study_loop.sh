#!/bin/bash
# Re-invoke study32.py auto until it prints DONE (each head chunk is one
# invocation). Serial chip usage; never kills anything. Touch
# /root/repo/study32/DEFER to pause between invocations.
cd /root/repo
export NLC_STUDY_DIR=/root/repo/study32
# wait for any already-running invocation to finish
if [ -f /tmp/study.pid ]; then
  while kill -0 "$(cat /tmp/study.pid)" 2>/dev/null; do sleep 20; done
fi
for i in $(seq 2 40); do
  log=logs/r3/study_run${i}.log
  if grep -q "^DONE" logs/r3/study_run*.log 2>/dev/null; then
    echo "study DONE"; exit 0
  fi
  if [ -f study32/DEFER ]; then
    echo "deferred; waiting"; sleep 60; continue
  fi
  python benchmarks/study32.py auto > "$log" 2>&1
  echo "$(date +%H:%M:%S) run $i rc=$? tail: $(tail -1 "$log")"
  sleep 5
done
echo "study loop exhausted without DONE"
exit 1
