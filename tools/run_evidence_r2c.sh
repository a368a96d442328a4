#!/bin/bash
# Round-2c serial TPU evidence batch, probe-gated: the tunneled backend
# goes UNAVAILABLE for long stretches; every entry is preceded by a cheap
# availability probe that retries until the tunnel answers, so entries
# are never burned against a dead backend.
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r2c.log}
: > "$LOG"

probe() {
  timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((8, 128), jnp.float32) @ jnp.ones((128, 8), jnp.float32)
jax.block_until_ready(x)
assert float(x[0, 0]) == 128.0
EOF
}

wait_tpu() {
  local n=0
  until probe; do
    n=$((n + 1))
    echo "probe $n failed $(date -u +%H:%M:%S), waiting" >> "$LOG"
    sleep 180
  done
  echo "tpu up $(date -u +%H:%M:%S)" >> "$LOG"
}

run() {
  wait_tpu
  echo "=== $1 === $(date -u +%H:%M:%S)" >> "$LOG"
  shift
  timeout "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

# Fix validation + headline first, then parity/exercise evidence, then
# the scale matrix, then knob sweeps, then the instanced dynamic bench.
run "bench default (int32 fix validation)" 2400 python bench.py
run "parity regroup vs brute" 2400 python tools/tpu_parity_regroup.py
run "exercise r2 (instance id, occlusion, stack)" 1800 python tools/tpu_exercise_r2.py
run "bench 250K tris" 1800 env RAYCORE_BENCH_TRIS=250000 python bench.py
run "bench blobby 1M tris" 3600 env RAYCORE_BENCH_SCENE=blobby python bench.py
run "bench 4M tris" 5400 env RAYCORE_BENCH_TRIS=4000000 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep SPB=32" 2400 env RAYCORE_BENCH_SPB=32 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep TILE=4096" 2400 env RAYCORE_BENCH_TILE=4096 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep TILE=4096 SPB=32" 2400 env RAYCORE_BENCH_TILE=4096 RAYCORE_BENCH_SPB=32 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep G=16 SPB=32" 2400 env RAYCORE_BENCH_SUBGROUP=16 RAYCORE_BENCH_SPB=32 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep CLUSTER=64" 2400 env RAYCORE_BENCH_CLUSTER=64 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep precision=high" 2400 env RAYCORE_MM_PRECISION=high RAYCORE_BENCH_REPS=3 python bench.py
run "instanced dynamic bench" 5400 python tools/tpu_instanced_bench.py

echo "=== DONE ===" >> "$LOG"
