#!/bin/bash
# Round-5 continuation (part J): the path-tracer warm frame (VERDICT r4
# missing #4, done-bar < 10 s; carried from round 2). Same phased plan
# as part H (which never got a TPU window); chained behind the part-I
# bench batch via PID wait. Phase timeboxes are tightened to fit the
# session window — a killed phase resumes deeper into the persistent
# compile cache on the next entry, and the part-I bench already cached
# the 1M-ray closest graphs at C=256 (the frame's query shape).
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r5j.log}
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

run "PT phase prewarm_closest (C=256, cached by part I bench)" 1500 \
    env RAYCORE_PT_PHASE=prewarm_closest python tools/tpu_pathtracer_bench.py
run "PT phase prewarm_anyhit (fresh occlusion kernel at C=256)" 2100 \
    env RAYCORE_PT_PHASE=prewarm_anyhit python tools/tpu_pathtracer_bench.py
run "PT phase frames (cold + 3 warm, done-bar <10 s)" 2400 \
    env RAYCORE_PT_PHASE=frames python tools/tpu_pathtracer_bench.py
run "PT phase pipelined (deferred whole-frame chain A/B)" 1500 \
    env RAYCORE_PT_PHASE=pipelined python tools/tpu_pathtracer_bench.py
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
