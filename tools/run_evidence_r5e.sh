#!/bin/bash
# Round-5 TPU evidence batch, part E. Part C landed through the slim /
# occlusion rows and died at the path-tracer entry when the VM was
# snapshotted (23:47 UTC); /tmp (and the JAX compile cache) SURVIVED
# this time, so the warm graphs are available. This re-queues only the
# still-unlanded rows, ordered by value per tunnel-minute:
#   tier 1  path tracer phases (carried <10 s done-bar, rounds 2-4)
#   tier 2  quick re-queues on warm graphs: 2M rays, engine=auto,
#           cold routing (probe fix), parity default + bf16x3
#   tier 3  4M-tri rows behind the C=512 / fuse-gate mitigations
#   tier 4  closing headline window
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r5e.log}
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

# --- tier 1: path tracer, phase-split (each phase rides the compile cache) ---
run "pt phase prewarm_closest" 3600 \
    env RAYCORE_PT_PHASE=prewarm_closest python tools/tpu_pathtracer_bench.py
run "pt phase prewarm_anyhit" 3600 \
    env RAYCORE_PT_PHASE=prewarm_anyhit python tools/tpu_pathtracer_bench.py
run "pt phase frames (done-bar <10 s warm)" 5400 \
    env RAYCORE_PT_PHASE=frames python tools/tpu_pathtracer_bench.py
run "pt phase pipelined (chained dispatch A/B)" 3600 \
    env RAYCORE_PT_PHASE=pipelined python tools/tpu_pathtracer_bench.py

# --- tier 2: quick re-queues on warm graphs ---
run "bench 1M tris / 2M rays (re-queue, died in tunnel outage)" 5400 \
    env RAYCORE_BENCH_RAYS=2097152 RAYCORE_BENCH_REPS=3 python bench.py
run "engine=auto (re-queue: scene-true hints, compact default)" 3600 \
    env RAYCORE_BENCH_ENGINE=auto RAYCORE_BENCH_REPS=3 python bench.py
run "cold-process warm routing proof (probe-fix)" 3600 \
    python tools/tpu_cold_routing.py
run "parity default (exact masks)" 3600 \
    python tools/tpu_parity_regroup.py
run "parity bf16x3 (flip-rate contract)" 5400 \
    env RAYCORE_MM_PRECISION=bf16x3 python tools/tpu_parity_regroup.py

# --- tier 3: 4M-tri scale rows behind the mitigations ---
run "C=512 kernel prewarm (250K tris)" 5400 \
    env RAYCORE_BENCH_TRIS=250000 RAYCORE_BENCH_CLUSTER=512 \
        RAYCORE_BENCH_REPS=2 python bench.py
run "bench 4M tris / 1M rays (C=512, K=8192)" 5400 \
    env RAYCORE_BENCH_TRIS=4000000 RAYCORE_BENCH_CLUSTER=512 \
        RAYCORE_BENCH_REPS=3 python bench.py
run "bench 4M tris / 1M rays (C=128, fuse-gated two-stage)" 5400 \
    env RAYCORE_BENCH_TRIS=4000000 RAYCORE_BENCH_REPS=3 python bench.py

# --- tier 4: closing window ---
run "headline window E-final (driver-identical)" 3600 \
    python bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
