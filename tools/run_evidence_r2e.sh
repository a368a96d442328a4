#!/bin/bash
# Round-2e TPU batch: A/B the worklist compaction lowering (argsort vs
# cumsum+scatter) on the headline config, regroup + packed, and validate
# parity under the scatter lowering. Probe-gated like r2c/r2d.
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r2e.log}
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

run "bench regroup worklist=scatter" 2400 env RAYCORE_WORKLIST=scatter RAYCORE_BENCH_REPS=3 python bench.py
run "parity regroup worklist=scatter" 2400 env RAYCORE_WORKLIST=scatter python tools/tpu_parity_regroup.py
run "bench packed worklist=scatter" 3600 env RAYCORE_WORKLIST=scatter RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_REPS=3 python bench.py
run "bench regroup TILE=512 worklist=scatter (entry matrix 4x)" 2400 env RAYCORE_WORKLIST=scatter RAYCORE_BENCH_TILE=512 RAYCORE_BENCH_REPS=3 python bench.py

echo "=== DONE ===" >> "$LOG"
