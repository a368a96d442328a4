#!/bin/bash
# Round-5 TPU evidence batch, part F (chained after part E by the
# launcher: waits for r5e's process to exit before starting).
#
# Tests NEXT.md lever #1 ("fewer, larger blocks") with ZERO code
# changes: building with cluster_size=256 halves the block count at
# ~1.25x the candidate volume. Model (census + per-block decomposition:
# fixed ~4.4 us/block + matmul ~2.3 us per (512,512) HIGHEST):
#   C=128: m ~ 5.5 memberships/subgroup x (4.4 + 2.3) us
#   C=256: m ~ 3.4 x (4.4 + 4.6) us  -> ~1.2-1.3x sweep-term bound
# If the headline row beats 8.4 Mrays/s, flip the big-scene default
# cluster_size and re-run a driver-identical window.
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r5f.log}
: > "$LOG"
export RAYCORE_BENCH_WAIT_TPU=1800
export RAYCORE_BENCH_DEADLINE=3000

probe() {
  timeout 600 python - <<'EOF' >/dev/null 2>&1
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
    sleep 120
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

# Fresh Mosaic kernel (N=4*256): prewarm at a small-but-regroup-sized
# shape per the standing rule (ray count a power of 4 post-truncation).
run "C=256 kernel prewarm (100K tris, 1M rays)" 5400 \
    env RAYCORE_BENCH_TRIS=100000 RAYCORE_BENCH_CLUSTER=256 \
        RAYCORE_BENCH_REPS=2 python bench.py
run "bench 1M tris / 1M rays, CLUSTER=256 (lever #1 A/B)" 5400 \
    env RAYCORE_BENCH_CLUSTER=256 RAYCORE_BENCH_REPS=3 python bench.py
run "bench 1M tris / 1M rays, CLUSTER=512 (lever #1 extension)" 5400 \
    env RAYCORE_BENCH_CLUSTER=512 RAYCORE_BENCH_REPS=3 python bench.py
run "headline window F-control (driver-identical, C=128 default)" 3600 \
    python bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
