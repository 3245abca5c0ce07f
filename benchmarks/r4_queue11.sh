#!/bin/bash
# Round-4 queue 11: queue 10's tail behind health gates. The plane wedged
# again between the no_all cell and the pred_fast bench (bench's fail-fast
# probe timed out; relay alive => wedged chip, not severed tunnel — only
# the remote side clears it). Queue 10's bash was stopped between stages;
# its in-flight normbw attempt drains under its own timeout and is
# resumable. Lesson folded in: probe the plane BEFORE EVERY chip stage,
# not just once at queue start.
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
cat > /tmp/q11probe.py <<'EOF'
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((1024, 1024), jnp.bfloat16)
r = np.asarray(jax.jit(lambda a: a @ a)(x))
print("probe ok", r.shape, flush=True)
EOF
gate() {
  until timeout 150 python /tmp/q11probe.py > logs/r4/probe_last.log 2>&1; do
    echo "$(date +%H:%M:%S) plane wedged — sleeping 300s"
    sleep 300
  done
  echo "$(date +%H:%M:%S) plane healthy"
}

# 0. queue 10's normbw child (pid recorded at takeover) drains first
ORPHAN=${NLC_Q11_WAIT_PID:-16436}
while kill -0 "$ORPHAN" 2>/dev/null; do sleep 30; done
echo "$(date +%H:%M:%S) normbw orphan drained"

# 1. normbw with the fixed slice fence (resumable; skips landed cells)
for attempt in 1 2 3; do
  gate
  run "normbw_q11a${attempt}" timeout 3600 python benchmarks/normbw.py
  grep -q "NORMBW_DONE" "logs/r4/normbw_q11a${attempt}.log" && break
done

# 2. extension row: pred_fast + int8-auto (new default) + fused
gate
run bench_predfast_q11 env NLC_BENCH_STYLE=pred_fast timeout 2400 python bench.py

# 3. study64 from scratch (stages: data/stats/train/head/sweep, all resumable)
rm -f study64/DEFER
for attempt in 1 2 3 4 5 6 7 8 9 10 11 12; do
  gate
  run "study64_q11_${attempt}" timeout 5400 python benchmarks/study64.py auto
  grep -q "DONE" "logs/r4/study64_q11_${attempt}.log" && break
done

echo "$(date +%H:%M:%S) r4_queue11 complete"
