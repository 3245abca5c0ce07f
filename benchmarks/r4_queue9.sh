#!/bin/bash
# Round-4 queue 9: post-reimage recovery queue. The sandbox VM was re-imaged
# mid-round (only committed files survived), killing queues 6-8 and erasing
# the uncommitted study64/normbw state; the reboot also appears to have
# wedged the tunneled TPU plane (device enumerates, 1024^2 jitted matmul
# never returns). This queue:
#   0. waits for the full-suite pytest run to finish (1 vCPU — no overlap)
#   1. polls chip health until a 1024^2 jitted matmul completes (<150 s)
#   2. bench.py re-capture (fused headline, driver-parity check)
#   3. normbw probe (residual ~80 ms norm bucket: memory floor or headroom?)
#   4. fused-era backend re-test: whole-loop 'auto' and 'conv@64' cells —
#      round 2 measured 'auto' losing on the un-fused Pallas quantize
#      boundary, which the fused norm epilogue has since eliminated
#   5. pred_fast+int8+fused extension bench row
#   6. study64 from scratch to DONE (resumable stage driver)
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

# 0. don't contend with the test suite for the single vCPU
while [ ! -f /tmp/pytest_done ]; do sleep 30; done
echo "$(date +%H:%M:%S) pytest done (rc=$(cat /tmp/pytest_done))"

# 1. health gate: retry the matmul probe until the plane answers
cat > /tmp/q9probe.py <<'EOF'
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((1024, 1024), jnp.bfloat16)
r = np.asarray(jax.jit(lambda a: a @ a)(x))
print("probe ok", r.shape, flush=True)
EOF
until timeout 150 python /tmp/q9probe.py > logs/r4/probe_last.log 2>&1; do
  echo "$(date +%H:%M:%S) chip probe failed; plane still wedged — sleeping 300s"
  sleep 300
done
echo "$(date +%H:%M:%S) chip healthy"

# 2. headline re-capture with the fused epilogues (what the driver will run)
run bench_q9 timeout 2400 python bench.py

# 3. norm-chain achieved-bandwidth probe (resumable; skips recorded cells)
for attempt in 1 2 3; do
  run "normbw_q9a${attempt}" timeout 3600 python benchmarks/normbw.py
  grep -q "NORMBW_DONE" "logs/r4/normbw_q9a${attempt}.log" && break
done

# 4. fused-era backend re-test + itemization-completion cells
#    (no_norm/no_all under the fused default give the fused-era norm
#    bucket exactly, for the BENCHMARKS oracle-arithmetic update)
export NLC_STEPPARTS_TAG=fused
for cell in auto conv_at64 no_norm no_all; do
  run "stepparts_fused_${cell}" timeout 1800 python benchmarks/stepparts.py "$cell"
done
unset NLC_STEPPARTS_TAG

# 5. extension row: pred_fast + int8 + fused
run bench_predfast_q9 env NLC_BENCH_STYLE=pred_fast timeout 2400 python bench.py

# 5. study64 from scratch (stages: data/stats/train/head/sweep, all resumable)
rm -f study64/DEFER
for attempt in 1 2 3 4 5 6 7 8 9 10 11 12; do
  run "study64_q9${attempt}" timeout 5400 python benchmarks/study64.py auto
  grep -q "DONE" "logs/r4/study64_q9${attempt}.log" && break
done

echo "$(date +%H:%M:%S) r4_queue9 complete"
