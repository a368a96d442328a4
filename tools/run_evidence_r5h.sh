#!/bin/bash
# Round-5 TPU evidence batch, part H: the path-tracer warm frame
# (VERDICT r4 missing #4, done-bar < 10 s; carried from round 2).
#
# Phased per the RAYCORE_PT_PHASE contract: the r5a single-entry run
# burned a 90-min timebox inside one opaque prewarm; each phase here
# gets its own timeout and resumes deeper into the persistent compile
# cache if killed. Runs at the C=256 default (part F), whose 1M-ray
# closest graphs are already cached on this machine.
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r5h.log}
WAIT_PID=${2:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
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

run "PT phase prewarm_closest (C=256, cached from part F)" 2400 \
    env RAYCORE_PT_PHASE=prewarm_closest python tools/tpu_pathtracer_bench.py
run "PT phase prewarm_anyhit (fresh occlusion kernel at C=256)" 3600 \
    env RAYCORE_PT_PHASE=prewarm_anyhit python tools/tpu_pathtracer_bench.py
run "PT phase frames (cold + 3 warm, done-bar <10 s)" 5400 \
    env RAYCORE_PT_PHASE=frames python tools/tpu_pathtracer_bench.py
run "PT phase pipelined (deferred whole-frame chain A/B)" 3600 \
    env RAYCORE_PT_PHASE=pipelined python tools/tpu_pathtracer_bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
