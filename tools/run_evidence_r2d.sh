#!/bin/bash
# Round-2d follow-up TPU batch: the packed sub-cluster engine (never yet
# benched on device) + bf16x3 (HIGH) precision parity + depth-complex
# two-pass pruning. Probe-gated like run_evidence_r2c.sh.
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r2d.log}
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

run "bench packed (defaults: C=128 SUBC=4 packs=8 spb_sub=2)" 3600 env RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_REPS=3 python bench.py
run "parity packed vs brute" 2400 env PARITY_ENGINE=packed python tools/tpu_parity_regroup.py
run "bench packed SUBC=2" 3600 env RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_SUBCHUNKS=2 RAYCORE_BENCH_PACKS=8 RAYCORE_BENCH_REPS=3 python bench.py
run "bench packed spb_sub=4" 3600 env RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_SPBSUB=4 RAYCORE_BENCH_REPS=3 python bench.py
run "bench packed G=16 spb_sub=4" 3600 env RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_SUBGROUP=16 RAYCORE_BENCH_SPBSUB=4 RAYCORE_BENCH_REPS=3 python bench.py
run "parity regroup precision=high (bf16x3)" 2400 env RAYCORE_MM_PRECISION=high python tools/tpu_parity_regroup.py
run "bench blobby passes=2 (two-pass pruning where depth exists)" 3600 env RAYCORE_BENCH_SCENE=blobby RAYCORE_BENCH_PASSES=2 RAYCORE_BENCH_REPS=3 python bench.py
run "bench packed blobby" 3600 env RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_SCENE=blobby RAYCORE_BENCH_REPS=3 python bench.py

echo "=== DONE ===" >> "$LOG"
