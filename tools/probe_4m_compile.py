"""Localize the 4M-tri fresh-shape compile blowup (VERDICT r5 task 4).

Times build_dense and closest_hit_regrouped phase-by-phase at growing
scene sizes on CPU with jax_log_compiles, counting distinct XLA
compilations and their wall cost. The remote (tunneled) compiler
multiplies each fresh-shape graph by minutes; whatever dominates here
is what must be bucketed/split for the 4M row to fit a timebox.

Usage: python tools/probe_4m_compile.py [n_tris] [n_rays]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_LOG_COMPILES"] = "1"

import logging
import re
log_records = []


class _Catch(logging.Handler):
    def emit(self, rec):
        m = rec.getMessage()
        if "Finished XLA compilation" in m:
            log_records.append(m)


for name in ("jax._src.interpreters.pxla", "jax._src.dispatch"):
    lg = logging.getLogger(name)
    lg.addHandler(_Catch())
    lg.setLevel(logging.DEBUG)
    lg.propagate = False

import numpy as np
import jax


def phase(name):
    n0 = len(log_records)
    t0 = time.time()

    def done():
        dt = time.time() - t0
        msgs = log_records[n0:]
        costed = []
        for m in msgs:
            mm = re.search(r"compilation of (\S+).* in ([0-9.]+) sec", m)
            if mm:
                costed.append((float(mm.group(2)), mm.group(1)))
        costed.sort(reverse=True)
        tot = sum(c for c, _ in costed)
        print(f"[{name}] {dt:8.2f} s wall, {len(msgs)} XLA compiles "
              f"({tot:.2f} s compile total)", flush=True)
        for c, nm in costed[:8]:
            print(f"    {c:8.2f} s  {nm[:90]}")
    return done


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1_048_576
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    import raycore_tpu as rc
    from raycore_tpu.accel.dense import build_dense
    from raycore_tpu.ops.pallas_regroup import closest_hit_regrouped

    d = phase("mesh")
    gn = int(np.sqrt(n_tris / 2))
    mesh = rc.displaced_grid_mesh(n=gn, extent=2.0, amplitude=0.35)
    d()

    d = phase("build_dense cold")
    sc = build_dense(mesh, cluster_size=C)
    float(sc.tri_feats[0, 0, 0])
    d()

    d = phase("build_dense warm")
    sc2 = build_dense(mesh, cluster_size=C)
    float(sc2.tri_feats[0, 0, 0])
    d()
    print(f"K={sc.n_clusters} C={sc.cluster_size}")

    side = int(np.sqrt(n_rays))
    import jax.numpy as jnp
    lo = np.asarray(sc.root_aabb[0])
    hi = np.asarray(sc.root_aabb[1])
    xs = np.linspace(lo[0] + 1e-3, hi[0] - 1e-3, side, dtype=np.float32)
    o = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    o = np.concatenate([o, np.full((o.shape[0], 1), hi[2] + 1.0,
                                   np.float32)], 1)
    dvec = np.tile(np.array([0, 0, -1], np.float32), (o.shape[0], 1))
    rays = rc.Ray.create(o=jnp.asarray(o), d=jnp.asarray(dvec))

    d = phase("regroup query cold (compile + run)")
    res = closest_hit_regrouped(sc, rays, tile=2048)
    float(jnp.sum(res.t[::257]))
    d()

    d = phase("regroup query warm")
    res = closest_hit_regrouped(sc, rays, tile=2048)
    float(jnp.sum(res.t[::257]))
    d()
    print(f"hit_frac={float(jnp.mean(res.hit.astype(jnp.float32))):.3f}")


if __name__ == "__main__":
    main()
