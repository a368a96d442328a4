#!/bin/bash
# Round-5 continuation (part I): fresh-machine validation batch.
#
# This machine's persistent compile cache (~/.jax_cache) and capacity
# hint store are EMPTY — a from-zero reproduction of the headline.
# Entry 1 runs `python bench.py` exactly as the driver does (default
# env): its first rep pays the fresh compile, subsequent reps ride the
# cache, and the run leaves the cache warm for the driver's
# end-of-round BENCH_r05 capture. Entry 2 repeats it warm — the
# driver-identical number this machine will report.
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r5i.log}
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

run "bench.py cold (fresh cache + hint store, driver-identical env)" 2400 \
    python bench.py
run "bench.py warm (driver-identical, cache + hints populated)" 1200 \
    python bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
