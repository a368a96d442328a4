"""Per-RAY (G=1) candidate census with t-ordering — the round-4
architecture-decision input (VERDICT r3 "Next round" #2).

The round-3 census (tools/candidate_stats.py) measured candidates per
ray for SUBGROUP-shared lists (G >= 8) and found them granularity-locked
at ~440-820 on the 1M headline scene. Two data points were never
measured and decide whether any step-change architecture can beat the
~15 Mrays/s in-paradigm ceiling:

  1. G=1: the candidate count when each ray keeps its OWN list (the limit
     a per-ray traversal machine — treelet / DDA / wave engine — works
     against). If G=1 is barely below G=8, per-ray machinery buys
     nothing on this workload.
  2. ORDERED counts: #candidates with entry(ray, cand) <= t_hit(ray) —
     what an entry-ordered traversal with early termination must test.
     The round-2 two-pass experiment suggested ordering is useless on
     the single-layer heightfield; this measures it exactly, per ray,
     and on the depth-complex blobby scene where it should pay.

Both are properties of the culling arithmetic, measured exactly on CPU.

Usage:
  JAX_PLATFORMS=cpu python tools/ray1_census.py [scene] [n_tris] [n_sample]
  scene in {heightfield, blobby}; defaults heightfield 1M tris,
  131072 sampled rays (64 contiguous Z-order chunks of 2048 out of the
  1M headline set, so G-reductions see the real coherence structure).
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = os.environ.get("RAYCORE_STATS_PLATFORM", "cpu")
if os.environ["JAX_PLATFORMS"] == "cpu" and os.environ.get(
        "PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    del env["PALLAS_AXON_POOL_IPS"]
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import raycore_tpu as rc
from raycore_tpu.accel.dense import build_dense, ray_features, FEAT
from raycore_tpu.core.triangle import safe_invdir
from raycore_tpu.accel.types import i32_as_f32
from candidate_stats import zorder_rays

EDGE_EPS = 1e-5


def bounds_at(scene, cs):
    """(T//cs, 3) min/max AABBs of contiguous cs-triangle chunks of the
    scene's SORTED order (exactly the granularity a sub-chunk engine
    culls at)."""
    hot = scene.prims_hot
    T = hot.shape[0]
    if T % cs:  # pad with zero rows (the empty-triangle sentinel) so
        # coarse granularities (cs > cluster pad quantum) reshape cleanly
        pad = cs - T % cs
        hot = jnp.concatenate([hot, jnp.zeros((pad, hot.shape[1]),
                                              hot.dtype)], axis=0)
        T += pad
    v = i32_as_f32(hot[:, :9]).reshape(T // cs, cs * 3, 3)
    return jnp.min(v, axis=1), jnp.max(v, axis=1)


@jax.jit
def entry_vs_bounds(o, d, bmin, bmax):
    """(R, K) per-ray slab entry t (inf = miss). Same clamped-invdir
    convention as the engines' per-ray tests."""
    invd = safe_invdir(jnp.where(d == 0.0, 0.0, d))
    t1 = (bmin[None, :, :] - o[:, None, :]) * invd[:, None, :]
    t2 = (bmax[None, :, :] - o[:, None, :]) * invd[:, None, :]
    lo = jnp.max(jnp.minimum(t1, t2), axis=2)
    hi = jnp.min(jnp.maximum(t1, t2), axis=2)
    lo = jnp.maximum(lo, 0.0)
    return jnp.where((lo <= hi) & (hi >= 0.0), lo, jnp.inf)


@jax.jit
def _wave_step(E, best, phi, feats, t_min):
    """Test each ray's nearest untested cluster; returns updated (E, best)."""
    Rc = E.shape[0]
    cid = jnp.argmin(E, axis=1)
    e_sel = jnp.take_along_axis(E, cid[:, None], axis=1)[:, 0]
    blocks = jnp.take(feats, cid, axis=0)               # (Rc, FEAT, 4C)
    q = jnp.einsum("rf,rfq->rq", phi, blocks)
    C = q.shape[1] // 4
    qs = q.reshape(Rc, 4, C)   # caller permutes to plain [det|u|v|t] x C
    det, udet, vdet, tdet = qs[:, 0], qs[:, 1], qs[:, 2], qs[:, 3]
    r = 1.0 / det
    u, v, t = udet * r, vdet * r, tdet * r
    e = EDGE_EPS
    ok = (u >= -e) & (u <= 1 + e) & (v >= -e) & (u + v <= 1 + e) \
        & (t >= t_min[:, None]) & (t <= best[:, None])
    tc = jnp.min(jnp.where(ok, t, jnp.inf), axis=1)
    do = jnp.isfinite(e_sel) & (e_sel <= best)
    best = jnp.where(do & (tc < best), tc, best)
    E = E.at[jnp.arange(Rc), cid].set(jnp.inf)
    return E, best


def exact_t_hit(scene, o, d, E_cluster, max_waves=512):
    """Exact closest-hit t per ray by entry-ordered cluster waves (the
    featurized MT arithmetic the engines use). inf on miss."""
    Rc = o.shape[0]
    phi = ray_features(o, d)
    best = jnp.full((Rc,), jnp.inf)
    t_min = jnp.zeros((Rc,))
    E = E_cluster
    SUB = scene.sub_chunks
    C = scene.cluster_size
    # un-subchunk the feature layout into plain [det|u|v|t] x C blocks
    feats = scene.tri_feats.reshape(-1, FEAT, SUB, 4, C // SUB) \
        .transpose(0, 1, 3, 2, 4).reshape(-1, FEAT, 4 * C)
    for w in range(max_waves):
        todo = jnp.isfinite(E) & (E < best[:, None])
        if not bool(jnp.any(todo)):
            break
        E = jnp.where(todo, E, jnp.inf)
        E, best = _wave_step(E, best, phi, feats, t_min)
    return best


def census_rows(scene, o, d, t_hit, grans, Gs, half=False):
    """rows[(cs, G)] = (unordered cand/ray, ordered cand/ray) summed over
    this chunk (caller averages). With half=True, cull at cs/2 AABBs but
    charge whole cs-chunks (union of the two children's pass masks) —
    the exact candidate volume of a cluster_size=cs engine whose refine
    tests the two half-cluster AABBs and takes the min entry
    (RAYCORE_CENSUS_HALF; prices NEXT.md lever #1's refined variant)."""
    out = {}
    for cs in grans:
        bmin, bmax = bounds_at(scene, cs // 2 if half else cs)
        K = bmin.shape[0]
        Rc = o.shape[0]
        # chunk over bounds to cap memory
        stats = {G: [0, 0] for G in Gs}
        CH = max(2, (1 << 24) // Rc & ~1)   # even: keep sibling pairs
        for lo in range(0, K, CH):
            E = entry_vs_bounds(o, d, bmin[lo:lo + CH], bmax[lo:lo + CH])
            if half:
                # parent entry = min over the two children; parent
                # passes iff either child does
                E = E.reshape(Rc, -1, 2).min(axis=2)
            for G in Gs:
                Eg = E.reshape(Rc // G, G, -1).min(axis=1)
                th = t_hit.reshape(Rc // G, G).max(axis=1)
                fin = jnp.isfinite(Eg)
                stats[G][0] += int(jnp.sum(fin)) * G
                # isfinite guard: a miss ray (t_hit = inf) must count its
                # finite-entry set, not inf<=inf over every chunk
                stats[G][1] += int(jnp.sum(fin & (Eg <= th[:, None]))) * G
        for G in Gs:
            out[(cs, G)] = (stats[G][0] * cs, stats[G][1] * cs)
    return out


def main():
    scene_kind = sys.argv[1] if len(sys.argv) > 1 else "heightfield"
    n_tris = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_sample = int(sys.argv[3]) if len(sys.argv) > 3 else 131_072
    nt = int(np.sqrt(n_tris / 2))
    if scene_kind == "blobby":
        mesh = rc.blobby_mesh(n_theta=nt, n_phi=nt)
    else:
        mesh = rc.displaced_grid_mesh(n=nt, extent=2.0, amplitude=0.35)
    print(f"scene={scene_kind} tris={mesh.vertices.shape[0]} "
          f"sample={n_sample}", flush=True)
    t0 = time.time()
    scene = build_dense(mesh, cluster_size=128, sub_chunks=4)
    jax.block_until_ready(scene.tri_feats)
    print(f"build {time.time() - t0:.1f}s K={scene.n_clusters}", flush=True)

    o_all, d_all = zorder_rays(1_048_576)
    R = o_all.shape[0]
    CHUNK = 2048
    n_chunks = n_sample // CHUNK
    stride = R // (CHUNK * n_chunks) * CHUNK

    grans = tuple(int(g) for g in os.environ.get(
        "RAYCORE_CENSUS_GRANS", "128,32,16,8").split(","))
    Gs = (1, 4, 8, 32)
    acc = {(cs, G): [0, 0] for cs in grans for G in Gs}
    n_done = 0
    hit_n = 0
    bmin_c, bmax_c = scene.cluster_min, scene.cluster_max
    for ci in range(n_chunks):
        lo = ci * stride
        o = o_all[lo:lo + CHUNK]
        d = d_all[lo:lo + CHUNK]
        E_c = entry_vs_bounds(o, d, bmin_c, bmax_c)
        t_hit = exact_t_hit(scene, o, d, E_c)
        hit_n += int(jnp.sum(jnp.isfinite(t_hit)))
        rows = census_rows(scene, o, d, t_hit, grans, Gs,
                           half=bool(int(os.environ.get(
                               "RAYCORE_CENSUS_HALF", "0"))))
        for k, v in rows.items():
            acc[k][0] += v[0]
            acc[k][1] += v[1]
        n_done += CHUNK
        if ci % 8 == 7:
            print(f"  chunk {ci + 1}/{n_chunks} ({time.time() - t0:.0f}s)",
                  flush=True)

    print(f"\nhit_frac={hit_n / n_done:.4f}")
    print(f"{'C_eff':>6} {'G':>3} {'cand/ray':>9} {'ordered':>9} "
          f"{'ord/unord':>9}")
    for cs in grans:
        for G in Gs:
            u, o_ = acc[(cs, G)]
            print(f"{cs:6d} {G:3d} {u / n_done:9.1f} {o_ / n_done:9.1f} "
                  f"{o_ / max(u, 1):9.2f}")
    print("\nordered = candidates with entry <= t_hit(ray): what an "
          "entry-ordered machine with early termination must test. "
          "Reference per-ray BVH tests ~32 (SURVEY §6).")


if __name__ == "__main__":
    main()
