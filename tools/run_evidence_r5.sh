#!/bin/bash
# Round-5 TPU evidence batch, part A. Order follows VERDICT r4 "Next
# round": (0) a driver-identical bench run — verify + headline
# reconciliation window 1; (1) the bf16x3 relaxed-tie device timing
# behind a compile prewarm (the decision's largest in-paradigm lever);
# (2) more reconciliation windows interleaved across the batch so the
# median/spread is across tunnel states; (3) routing + stage levers on
# device (engine=auto, occlusion, stage1=compact, cold routing); (4)
# scale-matrix ray rows (2M/4M rays; the 4M-tri row runs in a later
# part behind its compile mitigation); (5) instanced + path tracer.
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r5a.log}
: > "$LOG"
export RAYCORE_BENCH_WAIT_TPU=1800
export RAYCORE_BENCH_DEADLINE=3000

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

# --- tier 0: driver-identical headline (verify + reconciliation w1) ---
run "headline window 1 (driver-identical, default env)" 3600 \
    python bench.py

# --- tier 1: bf16x3 relaxed-tie lever (VERDICT r5 task 1) ---
# Fresh Pallas kernel configs take 15-40+ min in the remote compiler;
# prewarm the NEW KERNEL at a small-but-regroup-sized shape first
# (n_rays >= 2^19 so the regroup path is the one compiled), then the 1M
# shape rides the persistent cache's same-kernel new-shape cost.
run "bf16x3 prewarm (small shape, populates kernel cache)" 5400 \
    env RAYCORE_MM_PRECISION=bf16x3 RAYCORE_BENCH_TRIS=100000 \
        RAYCORE_BENCH_RAYS=524288 RAYCORE_BENCH_REPS=2 python bench.py
run "bf16x3 headline A/B (1M/1M, passes=1)" 5400 \
    env RAYCORE_MM_PRECISION=bf16x3 RAYCORE_BENCH_REPS=3 python bench.py
run "bf16x3 parity vs brute (on-device masks)" 3600 \
    env RAYCORE_MM_PRECISION=bf16x3 python tools/tpu_parity_regroup.py
run "bf16x3 blobby passes=4 (multiwave + exact-ub prune)" 5400 \
    env RAYCORE_MM_PRECISION=bf16x3 RAYCORE_BENCH_SCENE=blobby \
        RAYCORE_BENCH_PASSES=4 RAYCORE_BENCH_REPS=3 python bench.py

# --- tier 2: reconciliation window 2 ---
run "headline window 2 (driver-identical, default env)" 3600 \
    python bench.py

# --- tier 3: routing + stage levers on device (VERDICT r5 task 3) ---
run "bench engine=auto (dispatch routing measured in-bench)" 3600 \
    env RAYCORE_BENCH_ENGINE=auto RAYCORE_BENCH_REPS=3 python bench.py
run "bench engine=occlusion (any_hit, no finalize)" 3600 \
    env RAYCORE_BENCH_ENGINE=occlusion RAYCORE_BENCH_REPS=3 python bench.py
run "bench stage1=compact at headline config" 3600 \
    env RAYCORE_REGROUP_STAGE1=compact RAYCORE_BENCH_REPS=3 python bench.py
run "cold-process warm routing proof" 2400 \
    python tools/tpu_cold_routing.py

# --- tier 4: reconciliation window 3 + ray-scale rows ---
run "headline window 3 (driver-identical, default env)" 3600 \
    python bench.py
run "bench 1M tris / 2M rays" 5400 \
    env RAYCORE_BENCH_RAYS=2097152 RAYCORE_BENCH_REPS=3 python bench.py
run "bench 1M tris / 4M rays" 5400 \
    env RAYCORE_BENCH_RAYS=4194304 RAYCORE_BENCH_REPS=3 python bench.py
run "bench 250K tris / 4M rays" 5400 \
    env RAYCORE_BENCH_TRIS=250000 RAYCORE_BENCH_RAYS=4194304 \
        RAYCORE_BENCH_REPS=3 python bench.py

# --- tier 5: instanced + path tracer (VERDICT r5 tasks 5, 6) ---
run "instanced dynamic bench" 5400 python tools/tpu_instanced_bench.py
run "path tracer warm frame (done-bar <10 s)" 5400 \
    python tools/tpu_pathtracer_bench.py

# --- tier 6: reconciliation window 4 (post-everything tunnel state) ---
run "headline window 4 (driver-identical, default env)" 3600 \
    python bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
