#!/bin/bash
# Round-4 TPU evidence batch, part B — resumes run_evidence_r4.sh after
# the session crash at 01:25. The headline bench already landed
# (7.57 Mrays/s per-rep, chain 8.85, warm build 43.53 ms — see
# /tmp/evidence_r4.log); this part re-runs the fixed cold-routing proof,
# adds the gather probe (treelet decision microbenchmark), then
# continues the original tier order.
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r4b.log}
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

# --- tier 1 (cont.): routing proof + decision probes + census knobs ---
run "cold-process warm routing proof (VERDICT r4 task 7)" 2400 \
    python tools/tpu_cold_routing.py
run "VMEM gather probe NN=8192 (treelet decision input)" 1800 \
    python tools/tpu_gather_probe.py 8192 2048
run "per-block overhead decomposition (DMA vs matmul vs epilogue vs SPB)" 1800 \
    python tools/probe_block_overhead.py
run "bench regroup SPB=32 (per-block fixed cost halving)" 2400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_SPB=32 RAYCORE_BENCH_REPS=3 python bench.py
run "bench regroup tbl=contig (one sequential tbl DMA per block)" 2400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_REGROUP_TBL=contig RAYCORE_BENCH_REPS=3 python bench.py
run "bench regroup stage1=compact (sort-free grouping)" 2400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_REGROUP_STAGE1=compact RAYCORE_BENCH_REPS=3 python bench.py
run "bench packed SUBC=1 (cluster-granularity block-diagonal packing)" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_SUBCHUNKS=1 RAYCORE_BENCH_REPS=3 python bench.py
run "bench packed SUBC=4 (sub-cluster candidates)" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_ENGINE=packed RAYCORE_BENCH_REPS=3 python bench.py
run "parity regroup vs brute (on-device)" 2400 python tools/tpu_parity_regroup.py
run "parity packed vs brute (on-device)" 2400 env PARITY_ENGINE=packed python tools/tpu_parity_regroup.py
run "path tracer warm frame (done-bar: <10 s)" 5400 \
    python tools/tpu_pathtracer_bench.py

# --- tier 2: BASELINE scale matrix + depth-complex scene ---
run "bench 250K tris / 1M rays" 1800 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_TRIS=250000 python bench.py
run "bench 4M tris / 1M rays (K=32768)" 5400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_TRIS=4000000 RAYCORE_BENCH_REPS=3 python bench.py
run "bench 1M tris / 4M rays" 5400 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_RAYS=4194304 RAYCORE_BENCH_REPS=3 python bench.py
run "bench 250K tris / 4M rays (BASELINE :31 row)" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_TRIS=250000 RAYCORE_BENCH_RAYS=4194304 RAYCORE_BENCH_REPS=3 python bench.py
run "bench blobby 1M tris (depth-complex, passes=1)" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_SCENE=blobby python bench.py
run "bench blobby 1M tris passes=2 (pruning should pay here)" 3600 \
    env RAYCORE_BENCH_WAIT_TPU=0 RAYCORE_BENCH_SCENE=blobby RAYCORE_BENCH_PASSES=2 RAYCORE_BENCH_REPS=3 python bench.py

# --- tier 3: build decomposition + instanced + traversal A/B ---
run "build decomposition" 2400 python tools/profile_build.py
run "build decomposition 2 (perm variants)" 2400 python tools/profile_build2.py
run "instanced dynamic bench" 5400 python tools/tpu_instanced_bench.py
run "exercise (instance id, occlusion, stack)" 1800 python tools/tpu_exercise_r2.py
run "bench bvh traversal engine (scatter-stack A/B)" 3600 \
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

# --- tier 5 (appended mid-round if present): treelet A/B etc. ---
if [ -f tools/tpu_treelet_bench.py ]; then
  run "treelet wide-BVH Pallas traversal A/B" 5400 python tools/tpu_treelet_bench.py
fi
if [ -f tools/tpu_wave_bench.py ]; then
  run "wave engine A/B" 5400 python tools/tpu_wave_bench.py
fi
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
