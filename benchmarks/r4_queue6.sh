#!/bin/bash
# Round-4 follow-up queue: runs after r4_master drains its hbm16 cells.
# study64/DEFER was planted so r4_master's study64 attempts no-op and the
# master exits right after hbm16 — this queue then owns the chip serially:
#   1. CPU self-check of the corrected sigma_train cell (fence-bug fix)
#   2. chip re-capture of sigma_train (first capture discarded: dict fence)
#   3. bench.py re-capture (bench_fused rc=2 was a transient probe timeout)
#   4. un-defer study64 and drive it to DONE (resumable attempts)
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

# wait for r4_master to exit (never two chip jobs at once)
MASTER_PID=$(cat /tmp/r4master.pid 2>/dev/null)
while [ -n "$MASTER_PID" ] && kill -0 "$MASTER_PID" 2>/dev/null; do
  sleep 20
done

# 1. harness self-check on CPU (chip is idle now; host CPU is free)
if run sigma_train_quick env NLC_WORKLOADS_QUICK=1 NLC_BENCH_PLATFORM=cpu \
    timeout 900 python benchmarks/workloads.py sigma_train; then
  # 2. chip re-capture
  run workloads_sigma_train_v2 timeout 2400 python benchmarks/workloads.py sigma_train
else
  echo "sigma_train QUICK self-check failed - skipping chip run"
fi

# 3. bench re-capture (headline with fused+gated epilogues)
run bench_fused_v2 timeout 2400 python bench.py

# 4. study64 to completion
rm -f study64/DEFER
for attempt in 1 2 3 4 5 6 7 8 9 10; do
  run "study64_b${attempt}" timeout 5400 python benchmarks/study64.py auto
  grep -q "DONE" "logs/r4/study64_b${attempt}.log" && break
done

echo "$(date +%H:%M:%S) r4_queue6 complete"
