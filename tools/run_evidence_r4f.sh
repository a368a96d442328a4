#!/bin/bash
# Round-4 evidence, part F — the endgame remainder, reordered by VERDICT
# priority and HARD-timeboxed so every entry gets a shot before the round
# closes: path tracer (task 5) -> trimmed precision A/B (decision lever 2)
# -> 4M-tri scale row (task 4) -> instanced (task 6). Same hardening as
# r4e: driver-level probe gating + WAIT_TPU + DEADLINE.
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r4f.log}
: > "$LOG"
export RAYCORE_BENCH_WAIT_TPU=900
export RAYCORE_BENCH_DEADLINE=2100

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
    sleep 90
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

# Ordered by expected yield per tunnel-minute: the precision phases and
# the 4M-tri row reuse mostly-cached stage graphs (one fresh kernel/build
# compile each); the path tracer's many cold stage compiles go last.
run "relaxed-tie precision A/B, trimmed (high + bf16x3, headline only)" 1500 \
    env WAVE_PHASES=high-spb16,bf16x3-spb16 WAVE_SKIP_PARITY=1 \
    python tools/tpu_wave_bench.py
run "bench 4M tris / 1M rays (K=32768)" 1800 \
    env RAYCORE_BENCH_TRIS=4000000 RAYCORE_BENCH_REPS=3 python bench.py
run "instanced dynamic bench" 1500 python tools/tpu_instanced_bench.py
run "path tracer warm frame (done-bar: <10 s)" 1800 \
    python tools/tpu_pathtracer_bench.py
run "bench 1M tris / 4M rays" 1800 \
    env RAYCORE_BENCH_RAYS=4194304 RAYCORE_BENCH_REPS=3 python bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
