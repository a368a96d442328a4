#!/bin/bash
# Round-2b serial TPU batch: validate the prims_hot int32 fix on device
# (bench + parity + instance-identity exercise), then sweep regroup knobs
# (SPB / TILE / G / CLUSTER / matmul precision) hunting the next headline
# cut, then rerun the instanced dynamic bench with a compile-sized budget.
set -x
cd /root/repo
LOG=${1:-/tmp/sweep_r2b.log}
: > "$LOG"

run() {
  echo "=== $1 ===" >> "$LOG"
  shift
  timeout "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

run "bench default (fix validation)" 2400 python bench.py
run "parity regroup vs brute" 2400 python tools/tpu_parity_regroup.py
run "exercise r2 (instance id, occlusion, stack)" 1800 python tools/tpu_exercise_r2.py

run "sweep SPB=32" 2400 env RAYCORE_BENCH_SPB=32 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep TILE=4096" 2400 env RAYCORE_BENCH_TILE=4096 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep TILE=4096 SPB=32" 2400 env RAYCORE_BENCH_TILE=4096 RAYCORE_BENCH_SPB=32 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep G=16 SPB=32" 2400 env RAYCORE_BENCH_SUBGROUP=16 RAYCORE_BENCH_SPB=32 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep CLUSTER=64" 2400 env RAYCORE_BENCH_CLUSTER=64 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep precision=high" 2400 env RAYCORE_MM_PRECISION=high RAYCORE_BENCH_REPS=3 python bench.py

run "instanced dynamic bench (rerun, big budget)" 5400 python tools/tpu_instanced_bench.py

echo "=== DONE ===" >> "$LOG"
