#!/bin/bash
# Round-4 queue 10: takeover of queue 9's tail. Queue 9's bash was stopped
# (between-stage, chip job untouched) after its normbw stage completed all
# cells with the PRE-FIX full-carry fence (quarantined in
# normbw_badfence.jsonl) — the NORMBW_DONE marker stopped the retry loop
# before the committed fence fix could execute. This queue finishes the
# remaining stages with the fixed normbw re-run inserted BEFORE study64 so
# its verdict (norm chain at the memory floor vs tile headroom) arrives in
# time to act on this round:
#   0. wait for the in-flight conv_at64 stepparts cell (queue 9's orphan)
#   1. remaining fused-era itemization cells: no_norm, no_all
#   2. pred_fast + int8 + fused extension bench row
#   3. normbw re-run with the slice fence (3 resumable attempts)
#   4. study64 from scratch to DONE (resumable stage driver)
# Serial, one chip job at a time (CLAUDE.md).
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

# 0. queue 9's conv_at64 child (pid recorded at takeover) drains first
ORPHAN=${NLC_Q10_WAIT_PID:-10732}
while kill -0 "$ORPHAN" 2>/dev/null; do sleep 20; done
echo "$(date +%H:%M:%S) conv_at64 orphan drained"

# 1. remaining fused-era itemization cells
export NLC_STEPPARTS_TAG=fused
for cell in no_norm no_all; do
  run "stepparts_fused_${cell}" timeout 1800 python benchmarks/stepparts.py "$cell"
done
unset NLC_STEPPARTS_TAG

# 2. extension row: pred_fast + int8 + fused
run bench_predfast_q10 env NLC_BENCH_STYLE=pred_fast timeout 2400 python bench.py

# 3. normbw with the fixed slice fence (old capture quarantined)
for attempt in 1 2 3; do
  run "normbw_q10a${attempt}" timeout 3600 python benchmarks/normbw.py
  grep -q "NORMBW_DONE" "logs/r4/normbw_q10a${attempt}.log" && break
done

# 4. study64 from scratch (stages: data/stats/train/head/sweep, all resumable)
rm -f study64/DEFER
for attempt in 1 2 3 4 5 6 7 8 9 10 11 12; do
  run "study64_q10_${attempt}" timeout 5400 python benchmarks/study64.py auto
  grep -q "DONE" "logs/r4/study64_q10_${attempt}.log" && break
done

echo "$(date +%H:%M:%S) r4_queue10 complete"
