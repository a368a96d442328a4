#!/usr/bin/env python
"""Prove warm-engine routing survives process restarts (VERDICT r3 task 7).

Phase A (child process): build the headline scene, prewarm the regrouped
engine for the 1M-ray shape, run one dispatch query. This populates the
persistent capacity-hint store + the JAX compile cache.

Phase B (this process, started FRESH): build the same scene, assert
has_warm_capacity() is already True before any query, then time query 1
through the generic `rc.closest_hit` dispatch — it must route to the
regrouped engine (seconds, not the cold worklist path's behavior) purely
from on-disk state.

Run on the real TPU chip. Prints one JSON line per phase.
"""
import json
import os
import subprocess
import sys
import time

N_TRIS = int(os.environ.get("RAYCORE_BENCH_TRIS", 1_000_000))
N_RAYS = int(os.environ.get("RAYCORE_BENCH_RAYS", 1_048_576))


def run_phase(phase):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np
    import jax
    import jax.numpy as jnp
    import raycore_tpu as rc
    from raycore_tpu.accel.dense import build_dense
    from raycore_tpu.ops.pallas_regroup import has_warm_capacity

    grid_n = int(np.sqrt(N_TRIS / 2))
    mesh = rc.displaced_grid_mesh(n=grid_n, extent=2.0, amplitude=0.35)
    scene = build_dense(mesh, cluster_size=128)
    float(scene.tri_feats[0, 0, 0])

    side = int(np.sqrt(N_RAYS))
    n_rays = side * side
    xs = jnp.linspace(-0.95, 0.95, side, dtype=jnp.float32)
    X, Y = jnp.meshgrid(xs, xs, indexing="ij")
    o = jnp.stack([X, Y, jnp.full_like(X, 3.0)], -1).reshape(-1, 3)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32), o.shape)
    rays = rc.Ray.create(o=o, d=d)
    probe = jax.jit(lambda t: t[::257].sum())

    # Probe warmth exactly the way dispatch routes (accel/dispatch.py):
    # the auto-resolved passes first, then the plain passes=1 engine. A
    # probe at the has_warm_capacity default (passes=1) alone misses a
    # scene whose prewarm auto-resolved to the multiwave (the r5a rc=1:
    # prewarm warmed the passes=4 key, the tool probed passes=1).
    warm_before = (has_warm_capacity(scene, n_rays, passes="auto")
                   or has_warm_capacity(scene, n_rays, passes=1))
    if phase == "A":
        rc.prewarm(scene, n_rays, engine="regroup")
        t0 = time.time()
        res = rc.closest_hit(scene, rays)
        float(probe(res.t))
        dt = time.time() - t0
        print(json.dumps({"phase": "A", "warm_before": warm_before,
                          "query_s": round(dt, 4)}), flush=True)
        return 0
    # Phase B: fresh process — disk state only.
    t0 = time.time()
    res = rc.closest_hit(scene, rays)
    float(probe(res.t))
    dt = time.time() - t0
    t0 = time.time()
    res = rc.closest_hit(scene, rays)
    float(probe(res.t))
    dt2 = time.time() - t0
    out = {"phase": "B", "warm_before_query1": bool(warm_before),
           "query1_s": round(dt, 4), "query2_s": round(dt2, 4),
           "routed_fast": bool(warm_before),
           "mrays_q2": round(n_rays / dt2 / 1e6, 3)}
    print(json.dumps(out), flush=True)
    return 0 if warm_before else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ("A", "B"):
        sys.exit(run_phase(sys.argv[1]))
    rc_ = subprocess.run([sys.executable, os.path.abspath(__file__), "A"],
                         env=dict(os.environ)).returncode
    if rc_ != 0:
        print(json.dumps({"error": f"phase-A-rc-{rc_}"}), flush=True)
        sys.exit(1)
    sys.exit(subprocess.run(
        [sys.executable, os.path.abspath(__file__), "B"],
        env=dict(os.environ)).returncode)
