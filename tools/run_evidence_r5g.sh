#!/bin/bash
# Round-5 TPU evidence batch, part G — after part F flipped the bench
# default to cluster_size=256 (9.31 vs 8.50 same-batch A/B):
#
#   1. The LAST missing BASELINE scale-matrix row: 4M TRIS on device,
#      at the documented mitigation config (C=512 -> K=8192; fused
#      compile ~43 s per the probe table; the C=512 Mosaic kernel and
#      the K=8192 stage graphs are warm in this machine's caches from
#      part F).
#   2. The 2M-ray row that died-in-warmup-compile in part B.
#   3. Scale-matrix + blobby re-runs at the new C=256 default (the
#      committed 10.24 / 16.45 / 12.06 / 5.77 rows are C=128).
#   4. A second driver-identical headline window (variance).
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r5g.log}
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

run "bench 4M tris / 1M rays, CLUSTER=512 (BASELINE matrix last row)" 5400 \
    env RAYCORE_BENCH_TRIS=4000000 RAYCORE_BENCH_CLUSTER=512 \
        RAYCORE_BENCH_REPS=3 python bench.py
run "bench 1M tris / 2M rays (part-B re-queue, C=256 default)" 5400 \
    env RAYCORE_BENCH_RAYS=2097152 RAYCORE_BENCH_REPS=3 python bench.py
run "bench 1M tris / 4M rays (C=256 default)" 5400 \
    env RAYCORE_BENCH_RAYS=4194304 RAYCORE_BENCH_REPS=3 python bench.py
run "bench 250K tris / 4M rays (C=256 default)" 5400 \
    env RAYCORE_BENCH_TRIS=250000 RAYCORE_BENCH_RAYS=4194304 \
        RAYCORE_BENCH_REPS=3 python bench.py
run "bench 250K tris / 1M rays (C=256 default)" 3600 \
    env RAYCORE_BENCH_TRIS=250000 RAYCORE_BENCH_REPS=3 python bench.py
run "bench blobby 1M/1M passes=auto (C=256 default, multiwave)" 5400 \
    env RAYCORE_BENCH_SCENE=blobby RAYCORE_BENCH_REPS=3 python bench.py
run "headline window G-final (driver-identical, C=256 default)" 3600 \
    python bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
