#!/bin/bash
# Round-5 continuation (part K): engine=auto headline window — the
# dispatch-routing proof IN the bench (VERDICT r4 missing #6 leftover:
# the round-5 part-A auto row ran in the polluted-hint window at 5.23;
# hints are content-fingerprinted now and this machine's store is
# scene-true, populated by the part-I cold run). REPS=3 keeps it short.
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r5k.log}
WAIT_PID=${2:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
: > "$LOG"

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
    sleep 60
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

run "bench engine=auto headline (dispatch-routed, scene-true hints)" 1500 \
    env RAYCORE_BENCH_ENGINE=auto RAYCORE_BENCH_REPS=3 python bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
