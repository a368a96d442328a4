"""Relaxed-tie precision mode A/B — the measured first data point for the
round-4 architecture decision (VERDICT r3 "Next round" #2b).

The exactness bar this repo holds itself to (strict-closest parity with
the f32-HIGHEST brute oracle) is stricter than the reference's own GPU
semantics: Möller–Trumbore in plain fp32 with order-dependent t_max
shrinking makes no strict-closest guarantee under near-ties
(reference hot loop: src/instanced-bvh.jl:1756-1797). RAYCORE_MM_PRECISION
=high keeps every kernel and the conservative candidate logic identical
but runs the winner-SELECTION matmuls at bf16x3 (3 passes) instead of
fp32-exact (6 passes); the winning triangle's payload (t, u, v) is still
recomputed with full-precision scalar Möller–Trumbore in
finalize_hits_exact, so only which near-tied triangle wins can differ,
by at most ~2^-14 relative in t.

This tool measures, per phase (fresh process each, because the precision
constant resolves at import):
  1. headline 1M-ray / 1M-tri regroup throughput (3 reps, warm) at the
     given precision x SPB, and
  2. winner-flip statistics vs the HIGHEST brute oracle at 65K rays
     (hit-mask flips, prim flips, max relative t deviation of flips).

Usage: python tools/tpu_wave_bench.py          # runs all phases
       python tools/tpu_wave_bench.py PHASE    # one phase (internal)
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHASES = {
    # tag: (RAYCORE_MM_PRECISION, RAYCORE_BENCH_SPB)
    "highest-spb16": ("", "16"),
    "high-spb16": ("high", "16"),
    "bf16x3-spb16": ("bf16x3", "16"),   # manual 3-pass split: the control
                                        # for Mosaic ignoring HIGH
    "high-spb32": ("high", "32"),
}

# WAVE_PHASES=tag1,tag2 trims the phase list (tunnel time is scarce);
# WAVE_SKIP_PARITY=1 skips the brute-oracle flip stats (already measured
# exactly on the CPU sim — tools/ambiguity_census.py) and runs only the
# headline timing, which is the device-only quantity.
_SEL = [t for t in os.environ.get("WAVE_PHASES", "").split(",") if t]
if _SEL:
    PHASES = {t: PHASES[t] for t in _SEL}


def run_phase(tag):
    prec, spb = PHASES[tag]
    if prec:
        os.environ["RAYCORE_MM_PRECISION"] = prec
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
    import numpy as np
    import jax
    import jax.numpy as jnp
    import raycore_tpu as rc
    from raycore_tpu.accel.brute import closest_hit_brute
    from raycore_tpu.accel.dense import build_dense
    from raycore_tpu.ops.pallas_regroup import closest_hit_regrouped

    out = {"phase": tag, "mm_precision": prec or "highest", "spb": int(spb)}

    # --- flip statistics vs the HIGHEST oracle (brute is scalar-featurized
    # XLA at HIGHEST; unaffected by the Pallas kernels' precision knob).
    if not os.environ.get("WAVE_SKIP_PARITY"):
        mesh_s = rc.displaced_grid_mesh(n=224, extent=2.0, amplitude=0.35)
        scene_s = build_dense(mesh_s, cluster_size=128)
        R = 65536
        rng = np.random.default_rng(0)
        o = rng.uniform(-1, 1, (R, 3)).astype(np.float32)
        o[:, 2] = 2.0
        d = rng.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d[:, 2] = -np.abs(d[:, 2]) - 0.2
        d[::7] = [0.0, 0.0, -1.0]
        rays = rc.Ray.create(o=jnp.asarray(o), d=jnp.asarray(d))
        ref = closest_hit_brute(scene_s.prims, rays, ray_chunk=2048)
        got = closest_hit_regrouped(scene_s, rays, tile=2048, passes=1)
        rh, gh = np.asarray(ref.hit), np.asarray(got.hit)
        both = rh & gh
        rt, gt = np.asarray(ref.t)[both], np.asarray(got.t)[both]
        rel = np.abs(gt - rt) / np.maximum(np.abs(rt), 1e-6)
        flips = (np.asarray(ref.prim_idx)[both]
                 != np.asarray(got.prim_idx)[both])
        out["parity"] = {
            "rays": int(R),
            "hit_mask_flips": int(np.sum(rh != gh)),
            "prim_flips": int(np.sum(flips)),
            "prim_flip_frac": round(float(np.mean(flips)), 6),
            "max_rel_dt_all": float(np.max(rel)) if rel.size else 0.0,
            "max_rel_dt_flips": (float(np.max(rel[flips]))
                                 if flips.any() else 0.0),
        }

    # --- headline throughput (1M rays @ 1M tris, regroup, warm).
    grid_n = int(np.sqrt(1_000_000 / 2))
    mesh = rc.displaced_grid_mesh(n=grid_n, extent=2.0, amplitude=0.35)
    scene = build_dense(mesh, cluster_size=128)
    jax.block_until_ready(scene.tri_feats)
    side = 1024
    n_rays = side * side
    xs = jnp.linspace(-0.95, 0.95, side, dtype=jnp.float32)
    X, Y = jnp.meshgrid(xs, xs, indexing="ij")
    ro = jnp.stack([X, Y, jnp.full_like(X, 3.0)], -1).reshape(-1, 3)
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32),
                          ro.shape)
    big = rc.Ray.create(o=ro, d=rd)
    probe = jax.jit(lambda t: t[::257].sum())
    kw = dict(tile=2048, passes=1, spb=int(spb))
    times = []
    for _ in range(4):
        t0 = time.time()
        res = closest_hit_regrouped(scene, big, **kw)
        float(probe(res.t))
        times.append(round(time.time() - t0, 5))
    best = min(times[1:])
    out["headline"] = {"times_s": times, "best_s": best,
                       "mrays": round(n_rays / best / 1e6, 3),
                       "hit_frac": round(float(np.mean(
                           np.asarray(res.hit))), 5)}
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1:
        sys.exit(run_phase(sys.argv[1]))
    rc_total = 0
    for tag in PHASES:
        r = subprocess.run([sys.executable, os.path.abspath(__file__), tag],
                           env=dict(os.environ)).returncode
        if r != 0:
            print(json.dumps({"phase": tag, "error": f"rc-{r}"}), flush=True)
            rc_total = 1
    sys.exit(rc_total)
