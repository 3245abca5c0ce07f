#!/bin/bash
# Round-4 queue 12: post-(second)-re-image recovery. The sandbox VM was
# re-imaged again at ~03:45, erasing the gitignored study64 state and
# killing queue 11 — everything else from queue 11 had already landed
# (normbw, pred_fast+auto bench row). This queue restarts study64 from
# scratch (all stages resumable; now includes the two bonus int8-conv
# cells) and finishes with a default bench re-capture as round-close
# verification that the driver's BENCH_r04 capture will succeed.
# Health-gate before EVERY chip stage (queue-11 lesson).
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
cat > /tmp/q12probe.py <<'EOF'
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((1024, 1024), jnp.bfloat16)
r = np.asarray(jax.jit(lambda a: a @ a)(x))
print("probe ok", r.shape, flush=True)
EOF
gate() {
  until timeout 150 python /tmp/q12probe.py > logs/r4/probe_last.log 2>&1; do
    echo "$(date +%H:%M:%S) plane wedged — sleeping 300s"
    sleep 300
  done
  echo "$(date +%H:%M:%S) plane healthy"
}

# 1. study64 from scratch (stages: data/stats/train/head/sweep, resumable)
rm -f study64/DEFER
for attempt in $(seq 1 14); do
  gate
  run "study64_q12_${attempt}" timeout 5400 python benchmarks/study64.py auto
  grep -q "DONE" "logs/r4/study64_q12_${attempt}.log" && break
done

# 2. round-close default bench verification (headline config)
gate
run bench_close_q12 timeout 2400 python bench.py

echo "$(date +%H:%M:%S) r4_queue12 complete"
