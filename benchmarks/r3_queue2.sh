#!/bin/bash
# Round-3 chip queue, part 2: whole-loop batch-scaling benches implied by
# the floorprobe result (the small-spatial floor tracks M = batch*spatial;
# layer-level int8 rate doubles from B=8 to B=32). Waits for queue 1.
cd /root/repo
while kill -0 "$(cat /tmp/queue.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "$(date +%H:%M:%S) queue 1 exited; starting queue 2"
run() {
  name=$1; shift
  echo "$(date +%H:%M:%S) == $name =="
  "$@" > "logs/r3/${name}.log" 2>&1
  echo "$(date +%H:%M:%S) == $name rc=$? =="
}
# recapture the new default (int8 conv, B=8), then the batch scaling
run bench_conv_b8  env NLC_BENCH_QUANT=conv NLC_BENCH_BATCH=8  python bench.py
run bench_conv_b16 env NLC_BENCH_QUANT=conv NLC_BENCH_BATCH=16 python bench.py
run bench_conv_b32 env NLC_BENCH_QUANT=conv NLC_BENCH_BATCH=32 python bench.py
# bf16 at the best batch for the precision-matched row
run bench_bf16_b16 env NLC_BENCH_QUANT=bf16 NLC_BENCH_BATCH=16 python bench.py
echo "$(date +%H:%M:%S) queue 2 complete"
