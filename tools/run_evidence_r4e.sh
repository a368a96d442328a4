#!/bin/bash
# Round-4 evidence, part E — the r4c/r4d remainder reordered so the
# architecture-decision rows (blobby multiwave A/B) land before the
# long-running entries. Same hardening: driver-level probe gating +
# WAIT_TPU=1800 + DEADLINE=3000.
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r4e.log}
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

# --- tier A: architecture-decision A/B (multiwave on depth-complex) ---
run "bench blobby 1M tris passes=1 (depth-complex baseline)" 3600 \
    env RAYCORE_BENCH_SCENE=blobby RAYCORE_BENCH_REPS=3 python bench.py
run "bench blobby 1M tris passes=4 (MULTIWAVE architecture A/B)" 3600 \
    env RAYCORE_BENCH_SCENE=blobby RAYCORE_BENCH_PASSES=4 RAYCORE_BENCH_REPS=3 python bench.py
run "bench blobby 1M tris passes=2 (old two-pass, for the decision table)" 3600 \
    env RAYCORE_BENCH_SCENE=blobby RAYCORE_BENCH_PASSES=2 RAYCORE_BENCH_REPS=3 python bench.py

# --- tier B: precision A/B (2nd decision lever) + fast scale row ---
run "relaxed-tie precision A/B (highest vs high vs bf16x3)" 5400 \
    python tools/tpu_wave_bench.py
run "bench 250K tris / 1M rays" 2400 \
    env RAYCORE_BENCH_TRIS=250000 RAYCORE_BENCH_REPS=3 python bench.py
run "cold-process warm routing proof (VERDICT r4 task 7)" 2400 \
    python tools/tpu_cold_routing.py

# --- tier C: path tracer + remaining scale matrix ---
run "path tracer warm frame (done-bar: <10 s)" 5400 \
    python tools/tpu_pathtracer_bench.py
run "bench 4M tris / 1M rays (K=32768)" 5400 \
    env RAYCORE_BENCH_TRIS=4000000 RAYCORE_BENCH_REPS=3 python bench.py
run "bench 1M tris / 4M rays" 5400 \
    env RAYCORE_BENCH_RAYS=4194304 RAYCORE_BENCH_REPS=3 python bench.py
run "bench 250K tris / 4M rays (BASELINE :31 row)" 3600 \
    env RAYCORE_BENCH_TRIS=250000 RAYCORE_BENCH_RAYS=4194304 RAYCORE_BENCH_REPS=3 python bench.py

# --- tier D: build decomposition + instanced + traversal + packed ---
run "build decomposition" 2400 python tools/profile_build.py
run "build decomposition 2 (perm variants)" 2400 python tools/profile_build2.py
run "instanced dynamic bench" 5400 python tools/tpu_instanced_bench.py
run "bench bvh traversal engine (scatter-stack A/B)" 3600 \
    env RAYCORE_BENCH_ENGINE=bvh RAYCORE_BENCH_RAYS=262144 RAYCORE_BENCH_REPS=2 python bench.py
run "bench packed SUBC=4 (re-queue)" 3600 \
    env RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_REPS=3 python bench.py
run "parity packed vs brute (on-device)" 2400 \
    env PARITY_ENGINE=packed python tools/tpu_parity_regroup.py
run "exercise (instance id, occlusion, stack)" 1800 python tools/tpu_exercise_r2.py

# --- tier E: knob sweeps ---
run "bench regroup SPB=8" 2400 \
    env RAYCORE_BENCH_SPB=8 RAYCORE_BENCH_REPS=3 python bench.py
run "bench regroup TILE=4096" 2400 \
    env RAYCORE_BENCH_TILE=4096 RAYCORE_BENCH_REPS=3 python bench.py
run "bench heightfield passes=4 (multiwave sanity: ordering can't pay here)" 2400 \
    env RAYCORE_BENCH_PASSES=4 RAYCORE_BENCH_REPS=3 python bench.py
run "bench regroup stage1=compact (re-queue)" 2400 \
    env RAYCORE_REGROUP_STAGE1=compact RAYCORE_BENCH_REPS=3 python bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
