#!/bin/bash
# Serial TPU evidence runs for round 2: scale matrix (250K/1M-blobby/4M),
# on-device parity, occlusion+instance-identity exercise, dynamic
# instanced throughput. One at a time — single tunneled chip.
set -x
cd /root/repo
LOG=${1:-/tmp/evidence_r2.log}
: > "$LOG"

echo "=== bench 250K tris ===" >> "$LOG"
timeout 1800 env RAYCORE_BENCH_TRIS=250000 python bench.py >> "$LOG" 2>&1

echo "=== bench blobby 1M tris ===" >> "$LOG"
timeout 3600 env RAYCORE_BENCH_SCENE=blobby python bench.py >> "$LOG" 2>&1

echo "=== parity regroup vs brute (on-device) ===" >> "$LOG"
timeout 2400 python tools/tpu_parity_regroup.py >> "$LOG" 2>&1

echo "=== exercise r2 (instance id, occlusion, stack) ===" >> "$LOG"
timeout 1800 python tools/tpu_exercise_r2.py >> "$LOG" 2>&1

echo "=== instanced dynamic bench ===" >> "$LOG"
timeout 2700 python tools/tpu_instanced_bench.py >> "$LOG" 2>&1

echo "=== bench 4M tris ===" >> "$LOG"
timeout 5400 env RAYCORE_BENCH_TRIS=4000000 RAYCORE_BENCH_REPS=3 python bench.py >> "$LOG" 2>&1

echo "=== DONE ===" >> "$LOG"
