#!/bin/bash
# Round-5 TPU evidence batch, part B (revised after the part-A results
# and the compact-multiwave + pipelined-renderer landings). Runs
# strictly AFTER part A (one TPU process at a time): waits for the ALL
# DONE marker in the part-A log. Ordered by expected evidence value per
# tunnel-minute:
#   tier 0  BENCH_r05 predictor windows (new defaults, scene-true hints)
#   tier 1  round-5 lever A/Bs: compact multiwave on blobby (new),
#           grid unroll (prewarmed), slim payload
#   tier 2  path tracer warm frame (reworked tool: step-wise prewarm
#           prints + pipelined-frame A/B) — the 85-min opaque-prewarm
#           death in part A is re-queued with diagnosability
#   tier 3  re-queues: engine=auto clean window, occlusion tile 2048,
#           2M rays, cold routing, bf16x3 + default parity
#   tier 4  4M-tri scale rows behind the C=512 / fuse-gate mitigations
#   tier 5  decision-doc probe (512B bulk gather) + closing window
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r5b.log}
PREV=${2:-/tmp/evidence_r5a.log}
: > "$LOG"
export RAYCORE_BENCH_WAIT_TPU=1800
export RAYCORE_BENCH_DEADLINE=3000

until grep -q "ALL DONE" "$PREV" 2>/dev/null \
      || ! kill -0 "$(cat /tmp/r5a.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "part A finished $(date -u +%H:%M:%S)" >> "$LOG"

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

# --- tier 0: the BENCH_r05 predictor (new defaults, clean store) ---
run "headline window 5 (driver-identical, compact default)" 3600 \
    python bench.py
run "headline window 6 (driver-identical, repeat)" 3600 \
    python bench.py

# --- tier 1: round-5 lever A/Bs ---
run "blobby passes=4 SORT multiwave (round-4 arch, control)" 5400 \
    env RAYCORE_BENCH_SCENE=blobby RAYCORE_BENCH_PASSES=4 \
        RAYCORE_REGROUP_STAGE1=sort RAYCORE_BENCH_REPS=3 python bench.py
run "blobby passes=4 COMPACT multiwave (new driver)" 5400 \
    env RAYCORE_BENCH_SCENE=blobby RAYCORE_BENCH_PASSES=4 \
        RAYCORE_BENCH_REPS=3 python bench.py
run "unroll prewarm (small shape, fresh kernel)" 5400 \
    env RAYCORE_REGROUP_UNROLL=2 RAYCORE_BENCH_TRIS=100000 \
        RAYCORE_BENCH_RAYS=1048576 RAYCORE_BENCH_REPS=2 python bench.py
run "unroll=2 headline A/B" 5400 \
    env RAYCORE_REGROUP_UNROLL=2 RAYCORE_BENCH_REPS=3 python bench.py
run "unroll=4 headline A/B" 5400 \
    env RAYCORE_REGROUP_UNROLL=4 RAYCORE_BENCH_REPS=3 python bench.py
run "slim payload A/B (1M/1M)" 3600 \
    env RAYCORE_BENCH_PAYLOAD=slim RAYCORE_BENCH_REPS=3 python bench.py

# --- tier 2: path tracer warm frame + pipelined A/B (re-queue) ---
run "path tracer warm frame (step-wise prewarm, pipelined A/B)" 5400 \
    python tools/tpu_pathtracer_bench.py

# --- tier 3: re-queues in clean windows ---
run "engine=auto (dispatch routing, scene-true hints)" 3600 \
    env RAYCORE_BENCH_ENGINE=auto RAYCORE_BENCH_REPS=3 python bench.py
run "engine=occlusion at tile 2048" 3600 \
    env RAYCORE_BENCH_ENGINE=occlusion RAYCORE_BENCH_REPS=3 python bench.py
run "bench 1M tris / 2M rays (re-queue)" 5400 \
    env RAYCORE_BENCH_RAYS=2097152 RAYCORE_BENCH_REPS=3 python bench.py
run "cold-process warm routing proof (re-queue)" 3600 \
    python tools/tpu_cold_routing.py
run "parity bf16x3 (flip-rate tool)" 3600 \
    env RAYCORE_MM_PRECISION=bf16x3 python tools/tpu_parity_regroup.py
run "parity default (exact masks)" 3600 \
    python tools/tpu_parity_regroup.py

# --- tier 4: 4M-tri scale row behind the C=512 mitigation ---
run "C=512 kernel prewarm (250K tris)" 5400 \
    env RAYCORE_BENCH_TRIS=250000 RAYCORE_BENCH_CLUSTER=512 \
        RAYCORE_BENCH_REPS=2 python bench.py
run "bench 4M tris / 1M rays (C=512, K=8192)" 5400 \
    env RAYCORE_BENCH_TRIS=4000000 RAYCORE_BENCH_CLUSTER=512 \
        RAYCORE_BENCH_REPS=3 python bench.py
run "bench 4M tris / 1M rays (C=128, fuse-gated two-stage)" 5400 \
    env RAYCORE_BENCH_TRIS=4000000 RAYCORE_BENCH_REPS=3 python bench.py

# --- tier 5: decision-doc probe + closing window ---
run "bulk-gather 512B rows (BFS costing bracket)" 2400 \
    python tools/tpu_gather_probe.py 65536 2048
run "headline window 7 (closing)" 3600 \
    python bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
