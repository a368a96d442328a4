#!/bin/bash
# Round-3 TPU evidence batch — criticality-ordered so a short tunnel
# window still captures the decision-driving numbers. Reflects the
# round-3 CPU census (docs/performance.md): candidates/ray is ~fixed at
# cluster granularity, so the sweep levers under test are per-block
# overhead (SPB=32), per-cluster padding (packed SUBC=1 block-diagonal
# packing), and the BASELINE scale matrix. Probe-gated: every entry
# waits for the tunneled backend to answer first.
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r3.log}
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

# --- tier 1: headline + the two census-driven sweep experiments ---
run "bench regroup default (headline revalidation + driver cache prewarm)" 2400 \
    env RAYCORE_BENCH_WAIT_TPU=0 python bench.py
run "per-block overhead decomposition (DMA vs matmul vs epilogue vs SPB)" 1800 \
    python tools/probe_block_overhead.py
run "bench regroup SPB=32 (per-block fixed cost halving)" 2400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_SPB=32 RAYCORE_BENCH_REPS=3 python bench.py
run "bench regroup tbl=contig (one sequential tbl DMA per block)" 2400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_REGROUP_TBL=contig RAYCORE_BENCH_REPS=3 python bench.py
run "bench regroup stage1=compact (sort-free grouping)" 2400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_REGROUP_STAGE1=compact RAYCORE_BENCH_REPS=3 python bench.py
run "bench regroup stage1=compact worklist=scatter (O(N) compaction)" 2400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_REGROUP_STAGE1=compact RAYCORE_WORKLIST=scatter RAYCORE_BENCH_REPS=3 python bench.py
run "bench packed SUBC=1 (cluster-granularity block-diagonal packing, ~4% padding)" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_SUBCHUNKS=1 RAYCORE_BENCH_REPS=3 python bench.py
run "bench packed SUBC=4 (sub-cluster candidates)" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_REPS=3 python bench.py
run "parity regroup vs brute (on-device)" 2400 python tools/tpu_parity_regroup.py
run "parity packed vs brute (on-device)" 2400 env PARITY_ENGINE=packed python tools/tpu_parity_regroup.py

run "path tracer warm frame (VERDICT r3 task 4 done-bar: <10 s)" 5400 \
    python tools/tpu_pathtracer_bench.py

# --- tier 2: BASELINE scale matrix (VERDICT r3 task 6) ---
run "bench 250K tris / 1M rays" 1800 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_TRIS=250000 python bench.py
run "bench 4M tris / 1M rays (K=32768)" 5400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_TRIS=4000000 RAYCORE_BENCH_REPS=3 python bench.py
run "bench 1M tris / 4M rays" 5400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_RAYS=4194304 RAYCORE_BENCH_REPS=3 python bench.py
run "bench 250K tris / 4M rays (BASELINE :31 row)" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_TRIS=250000 RAYCORE_BENCH_RAYS=4194304 RAYCORE_BENCH_REPS=3 python bench.py
run "bench blobby 1M tris (depth-complex)" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_SCENE=blobby python bench.py

# --- tier 3: build-time decomposition (VERDICT r3 task 5) + aux ---
run "build decomposition" 2400 python tools/profile_build.py
run "build decomposition 2 (perm variants)" 2400 python tools/profile_build2.py
run "instanced dynamic bench" 5400 python tools/tpu_instanced_bench.py
run "exercise (instance id, occlusion, stack)" 1800 python tools/tpu_exercise_r2.py

run "bench bvh traversal engine (scatter-stack A/B vs r2's 0.25 Mrays/s)" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_ENGINE=bvh RAYCORE_BENCH_RAYS=262144 RAYCORE_BENCH_REPS=2 python bench.py

# --- tier 4: knob sweeps ---
run "bench regroup SPB=8" 2400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_SPB=8 RAYCORE_BENCH_REPS=3 python bench.py
run "bench regroup TILE=4096" 2400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_TILE=4096 RAYCORE_BENCH_REPS=3 python bench.py
run "bench packed SUBC=1 spb_sub=4 packs=8" 2400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_SUBCHUNKS=1 RAYCORE_BENCH_SPBSUB=4 RAYCORE_BENCH_REPS=3 python bench.py
run "bench regroup worklist=scatter" 2400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_WORKLIST=scatter RAYCORE_BENCH_REPS=3 python bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
