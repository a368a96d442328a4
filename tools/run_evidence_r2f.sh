#!/bin/bash
# Round-2f consolidated TPU evidence batch — replaces the r2c->r2d->r2e
# chain with ONE criticality-ordered list, so if the tunnel only comes
# back for a few hours we still capture the decision-driving numbers
# first: (1) fix-validated headline, (2) packed engine (the candidate-
# reduction lever, never yet measured on device), (3) on-device parity,
# (4) the BASELINE scale matrix, then knob sweeps / A-Bs. Probe-gated:
# every entry waits for the tunneled backend to answer first.
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r2f.log}
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

# --- tier 1: decision-driving ---
run "bench regroup default (int32-fix validation + headline)" 2400 \
    env RAYCORE_BENCH_WAIT_TPU=0 python bench.py
run "bench packed default (C=128 SUBC=4 packs=8 spb_sub=2)" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_REPS=3 python bench.py
run "parity regroup vs brute" 2400 python tools/tpu_parity_regroup.py
run "parity packed vs brute" 2400 env PARITY_ENGINE=packed python tools/tpu_parity_regroup.py

# --- tier 2: BASELINE scale matrix + correctness exercise ---
run "bench 250K tris" 1800 env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_TRIS=250000 python bench.py
run "bench 4M tris" 5400 env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_TRIS=4000000 RAYCORE_BENCH_REPS=3 python bench.py
run "bench blobby 1M tris (depth-complex)" 3600 env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_SCENE=blobby python bench.py
run "exercise r2 (instance id, occlusion, stack)" 1800 python tools/tpu_exercise_r2.py
run "instanced dynamic bench" 5400 python tools/tpu_instanced_bench.py

# --- tier 3: lowering A/Bs and knob sweeps ---
run "bench regroup worklist=scatter" 2400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_WORKLIST=scatter RAYCORE_BENCH_REPS=3 python bench.py
run "bench packed SUBC=2" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_SUBCHUNKS=2 RAYCORE_BENCH_PACKS=8 RAYCORE_BENCH_REPS=3 python bench.py
run "bench packed spb_sub=4" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_SPBSUB=4 RAYCORE_BENCH_REPS=3 python bench.py
run "bench packed G=16 spb_sub=4" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_SUBGROUP=16 RAYCORE_BENCH_SPBSUB=4 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep regroup SPB=32" 2400 env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_SPB=32 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep regroup TILE=4096" 2400 env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_TILE=4096 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep regroup G=16 SPB=32" 2400 env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_SUBGROUP=16 RAYCORE_BENCH_SPB=32 RAYCORE_BENCH_REPS=3 python bench.py
run "sweep regroup CLUSTER=64" 2400 env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_CLUSTER=64 RAYCORE_BENCH_REPS=3 python bench.py
run "parity regroup precision=high (bf16x3)" 2400 env RAYCORE_MM_PRECISION=high python tools/tpu_parity_regroup.py
run "bench blobby passes=2 (pruning where depth exists)" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_SCENE=blobby RAYCORE_BENCH_PASSES=2 RAYCORE_BENCH_REPS=3 python bench.py
run "bench packed blobby" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_SCENE=blobby RAYCORE_BENCH_REPS=3 python bench.py

echo "=== DONE ===" >> "$LOG"
