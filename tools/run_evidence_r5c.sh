#!/bin/bash
# Round-5 TPU evidence batch, part C (fresh session: ~/.jax_cache and the
# capacity-hint store were wiped with /tmp, so the cache must be rebuilt
# before any timing row is meaningful — tier 0 does that as a side effect
# of the predictor windows). Re-queues every part-B entry whose row never
# landed in docs/evidence plus the carried rc!=0 entries:
#   tier 0  headline windows (rebuild compile cache + scene-true hints)
#   tier 1  lever A/Bs with no committed device row: unroll, slim payload
#   tier 2  anyhit/auto engines (also prewarms the path tracer's graphs)
#   tier 3  path tracer warm frame (<10 s done-bar, carried from round 2)
#   tier 4  2M rays, cold routing, parity (default + bf16x3)
#   tier 5  4M-tri rows behind the C=512 / fuse-gate mitigations
#   tier 6  closing window
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r5c.log}
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

# --- tier 0: rebuild warm state + BENCH_r05 predictor windows ---
run "headline window C1 (cold cache rebuild, driver-identical)" 5400 \
    python bench.py
run "headline window C2 (warm, the predictor row)" 3600 \
    python bench.py

# --- tier 1: lever A/Bs (no committed device rows yet) ---
run "unroll=2 prewarm (small shape, fresh Mosaic kernel)" 5400 \
    env RAYCORE_REGROUP_UNROLL=2 RAYCORE_BENCH_TRIS=100000 \
        RAYCORE_BENCH_RAYS=1048576 RAYCORE_BENCH_REPS=2 python bench.py
run "unroll=2 headline A/B" 5400 \
    env RAYCORE_REGROUP_UNROLL=2 RAYCORE_BENCH_REPS=3 python bench.py
run "unroll=4 prewarm (small shape, fresh Mosaic kernel)" 5400 \
    env RAYCORE_REGROUP_UNROLL=4 RAYCORE_BENCH_TRIS=100000 \
        RAYCORE_BENCH_RAYS=1048576 RAYCORE_BENCH_REPS=2 python bench.py
run "unroll=4 headline A/B" 5400 \
    env RAYCORE_REGROUP_UNROLL=4 RAYCORE_BENCH_REPS=3 python bench.py
run "slim payload A/B (1M/1M)" 3600 \
    env RAYCORE_BENCH_PAYLOAD=slim RAYCORE_BENCH_REPS=3 python bench.py

# --- tier 2: engine rows that also prewarm the path tracer's graphs ---
run "engine=occlusion at tile 2048 (re-queue, default-tile fix)" 5400 \
    env RAYCORE_BENCH_ENGINE=occlusion RAYCORE_BENCH_REPS=3 python bench.py
run "engine=auto (dispatch routing, scene-true hints)" 3600 \
    env RAYCORE_BENCH_ENGINE=auto RAYCORE_BENCH_REPS=3 python bench.py

# --- tier 3: path tracer warm frame (carried done-bar) ---
run "path tracer warm frame (step-wise prewarm, pipelined A/B)" 7200 \
    python tools/tpu_pathtracer_bench.py

# --- tier 4: scale + routing + parity re-queues ---
run "bench 1M tris / 2M rays (re-queue)" 5400 \
    env RAYCORE_BENCH_RAYS=2097152 RAYCORE_BENCH_REPS=3 python bench.py
run "cold-process warm routing proof (re-queue, warm store)" 3600 \
    python tools/tpu_cold_routing.py
run "parity default (exact masks)" 3600 \
    python tools/tpu_parity_regroup.py
run "parity bf16x3 (flip-rate contract)" 5400 \
    env RAYCORE_MM_PRECISION=bf16x3 python tools/tpu_parity_regroup.py

# --- tier 5: 4M-tri scale rows behind the mitigations ---
run "C=512 kernel prewarm (250K tris)" 5400 \
    env RAYCORE_BENCH_TRIS=250000 RAYCORE_BENCH_CLUSTER=512 \
        RAYCORE_BENCH_REPS=2 python bench.py
run "bench 4M tris / 1M rays (C=512, K=8192)" 5400 \
    env RAYCORE_BENCH_TRIS=4000000 RAYCORE_BENCH_CLUSTER=512 \
        RAYCORE_BENCH_REPS=3 python bench.py
run "bench 4M tris / 1M rays (C=128, fuse-gated two-stage)" 5400 \
    env RAYCORE_BENCH_TRIS=4000000 RAYCORE_BENCH_REPS=3 python bench.py

# --- tier 6: closing window ---
run "headline window C3 (closing)" 3600 \
    python bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
