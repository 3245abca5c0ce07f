#!/bin/bash
# Round-3 chip queue, part 3: re-run the two B-scaling int8 benches that hit
# the post-bench tunnel-settle probe timeouts (60 s settle between jobs),
# then the re-validated attn-backward harness and the 3-mode input-wait
# bench (native C++ paired loader rows).
cd /root/repo
while kill -0 "$(cat /tmp/queue2.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "$(date +%H:%M:%S) queue 2 exited; starting queue 3"
run() {
  name=$1; shift
  echo "$(date +%H:%M:%S) == $name =="
  "$@" > "logs/r3/${name}.log" 2>&1
  echo "$(date +%H:%M:%S) == $name rc=$? =="
  sleep 60
}
run bench_conv_b16 env NLC_BENCH_QUANT=conv NLC_BENCH_BATCH=16 NLC_BENCH_PROBE_TIMEOUT=300 python bench.py
run bench_conv_b32 env NLC_BENCH_QUANT=conv NLC_BENCH_BATCH=32 NLC_BENCH_PROBE_TIMEOUT=300 python bench.py
run attn_bwd2 python benchmarks/attn_bwd_train.py
run input_wait2 python benchmarks/input_wait_bench.py
echo "$(date +%H:%M:%S) queue 3 complete"
