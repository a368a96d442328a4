"""Cost model for a level-synchronous bulk-gather BFS wavefront engine —
closes the round-4 decision-doc hole (VERDICT r4 weak #3 / task 7).

The round-4 architecture decision rejected per-ray hierarchy traversal
using the DEPENDENT gather price (3615 ns/row, tools/tpu_gather_probe.py
one-hot path). A level-synchronous BFS wavefront is priced by a
different probe: rays grouped by node id per level, each level's node
rows fetched in ONE bulk `jnp.take` (~0.9 ms fixed + ~12 ns/row for 64B
rows, ~47 ns/row for 160B rows — both measured, docs/performance.md
round-1 probe table). This sim counts the exact gather volume such an
engine would move on the two bench scenes and prices it with those
measured constants.

Engine being costed (16-wide Morton-chunked BVH, uniform leaf depth):
  per level: sort frontier (ray,node) pairs by node id [~free],
  bulk-gather each expanded node's 16-child AABB row (16x6 f32 = 384 B),
  slab-test all 16 children per pair on the VPU, emit passing children.
  At the leaf level: bulk-gather 16-tri blocks (576 B) and run MT.
Two variants:
  plain    — frontier pruned only by [t_min, t_max] (uniform leaf depth
             means no best-t exists until the leaf level).
  ordered  — phase 1 descends only the nearest passing child per pair
             (one root-to-leaf path per ray) to seed best_t, then the
             full BFS prunes by entry_t <= best_t (the multiwave trick
             applied to BFS).

Reference architecture being re-costed: the per-ray two-level stack
machine of /root/reference/src/instanced-bvh.jl:1728-2140.

Usage: python tools/bfs_cost_sim.py [n_tris] [n_rays_sample]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np

W = 16          # tree width and tris per leaf
T_MIN = 1e-4

# Measured device constants (docs/performance.md round-1 probe table).
NS_ROW_64B = 12.0     # bulk jnp.take, (N,16) i32 rows
NS_ROW_160B = 47.0    # finalize payload gather, 160 B rows
FIXED_GATHER_MS = 0.9
VPU_OPS_PER_S = 0.44e12
SORT_MS = 0.1


def _expand_bits(v):
    v = v.astype(np.uint64)
    v = (v * 0x00010001) & 0xFF0000FF
    v = (v * 0x00000101) & 0x0F00F00F
    v = (v * 0x00000011) & 0xC30C30C3
    v = (v * 0x00000005) & 0x49249249
    return v


def morton_order(cent):
    lo, hi = cent.min(0), cent.max(0)
    q = np.clip(((cent - lo) / np.maximum(hi - lo, 1e-12) * 1023), 0,
                1023).astype(np.uint32)
    code = (_expand_bits(q[:, 0]) << 2) | (_expand_bits(q[:, 1]) << 1) \
        | _expand_bits(q[:, 2])
    return np.argsort(code, kind="stable")


def build_tree(tris):
    """Morton-chunked complete W-ary AABB tree. Returns list of
    (n_nodes, 2, 3) level arrays, root last removed — levels[0] is the
    16-leaf-parent level ... levels[-1] has <= W nodes (the root row)."""
    order = morton_order(tris.mean(axis=1))
    tris = tris[order]
    t = tris.shape[0]
    n_leaf = -(-t // W)
    tmin = np.full((n_leaf * W, 3), np.inf, np.float32)
    tmax = np.full((n_leaf * W, 3), -np.inf, np.float32)
    tmin[:t] = tris.min(axis=1)
    tmax[:t] = tris.max(axis=1)
    # leaf AABBs
    lv_min = tmin.reshape(n_leaf, W, 3).min(axis=1)
    lv_max = tmax.reshape(n_leaf, W, 3).max(axis=1)
    levels = [(lv_min, lv_max)]          # levels[0] = leaf AABBs
    while levels[-1][0].shape[0] > 1:
        mn, mx = levels[-1]
        n = mn.shape[0]
        pad = -(-n // W) * W - n
        if pad:
            mn = np.concatenate([mn, np.full((pad, 3), np.inf, np.float32)])
            mx = np.concatenate([mx, np.full((pad, 3), -np.inf, np.float32)])
        levels.append((mn.reshape(-1, W, 3).min(axis=1),
                       mx.reshape(-1, W, 3).max(axis=1)))
    return tris, levels


def slab(o, inv_d, mn, mx, t_lo, t_hi):
    """Vectorized slab test. o/inv_d (P,3); mn/mx (P,3); t bounds (P,)."""
    t0 = (mn - o) * inv_d
    t1 = (mx - o) * inv_d
    near = np.minimum(t0, t1).max(axis=-1)
    far = np.maximum(t0, t1).min(axis=-1)
    near_c = np.maximum(near, t_lo)
    far_c = np.minimum(far, t_hi)
    return (near_c <= far_c), np.maximum(near, t_lo)


def mt_best(tris_blk, o, d, t_lo, t_hi):
    """Möller–Trumbore over (P, W, 3, 3) blocks; returns per-P best t."""
    v0 = tris_blk[:, :, 0]
    e1 = tris_blk[:, :, 1] - v0
    e2 = tris_blk[:, :, 2] - v0
    dd = d[:, None, :]
    s1 = np.cross(dd, e2)
    det = np.sum(s1 * e1, axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(det != 0.0, 1.0 / det, 0.0)
        dv = o[:, None, :] - v0
        u = np.sum(dv * s1, axis=-1) * inv
        s2 = np.cross(dv, e1)
        w = np.sum(dd * s2, axis=-1) * inv
        t = np.sum(e2 * s2, axis=-1) * inv
    ok = (det != 0.0) & (u >= 0) & (u <= 1) & (w >= 0) & (u + w <= 1) \
        & (t >= t_lo[:, None]) & (t <= t_hi[:, None])
    t = np.where(ok, t, np.inf)
    return t.min(axis=1)


def bfs_counts(tris, levels, o, d, seed_best=None):
    """Level-synchronous BFS. Returns (per-level expanded pair counts
    top->leaf-parents, leaf pair count, final best_t)."""
    n_rays = o.shape[0]
    with np.errstate(divide="ignore"):
        inv_d = np.where(d != 0, 1.0 / d, np.float32(np.inf))
    best = np.full(n_rays, np.inf, np.float32) if seed_best is None \
        else seed_best.copy()
    # frontier at the top: every ray holds the root's row (levels[-1]).
    ray_id = np.arange(n_rays)
    node_id = np.zeros(n_rays, np.int64)
    counts = []
    # walk levels from top row down to leaf-parent row (levels[0] is
    # leaf AABBs; expanding a node at levels[i] tests its W children at
    # levels[i-1], children of node n are n*W..n*W+W-1).
    for li in range(len(levels) - 1, 0, -1):
        counts.append(ray_id.shape[0])
        mn, mx = levels[li - 1]
        child = node_id[:, None] * W + np.arange(W)[None, :]
        child = np.minimum(child, mn.shape[0] - 1)
        ok, entry = slab(o[ray_id, None], inv_d[ray_id, None],
                         mn[child], mx[child], T_MIN, best[ray_id, None])
        r, c = np.nonzero(ok)
        ray_id = ray_id[r]
        node_id = child[r, c]
    # leaf stage: node_id indexes leaf blocks of W tris.
    leaf_pairs = ray_id.shape[0]
    if leaf_pairs:
        blk = tris.reshape(-1, W, 3, 3) if tris.shape[0] % W == 0 else None
        if blk is None:
            padt = np.zeros((-(-tris.shape[0] // W) * W, 3, 3), np.float32)
            padt[:tris.shape[0]] = tris
            blk = padt.reshape(-1, W, 3, 3)
        # chunk to bound memory
        for s in range(0, leaf_pairs, 1 << 20):
            sl = slice(s, min(s + (1 << 20), leaf_pairs))
            rid = ray_id[sl]
            tbest = mt_best(blk[node_id[sl]], o[rid], d[rid],
                            np.full(rid.shape, T_MIN, np.float32),
                            best[rid])
            np.minimum.at(best, rid, tbest)
    return counts, leaf_pairs, best


def ordered_seed(tris, levels, o, d):
    """Phase 1: descend only the nearest passing child per ray (one
    root-to-leaf path), seeding best_t. Gather volume = depth rows/ray."""
    n_rays = o.shape[0]
    with np.errstate(divide="ignore"):
        inv_d = np.where(d != 0, 1.0 / d, np.float32(np.inf))
    best = np.full(n_rays, np.inf, np.float32)
    ray_id = np.arange(n_rays)
    node_id = np.zeros(n_rays, np.int64)
    pairs = 0
    for li in range(len(levels) - 1, 0, -1):
        pairs += ray_id.shape[0]
        mn, mx = levels[li - 1]
        child = node_id[:, None] * W + np.arange(W)[None, :]
        child = np.minimum(child, mn.shape[0] - 1)
        ok, entry = slab(o[ray_id, None], inv_d[ray_id, None],
                         mn[child], mx[child], T_MIN, best[ray_id, None])
        entry = np.where(ok, entry, np.inf)
        pick = entry.argmin(axis=1)
        alive = ok[np.arange(ok.shape[0]), pick]
        ray_id = ray_id[alive]
        node_id = child[np.arange(child.shape[0]), pick][alive]
    if ray_id.shape[0]:
        padt = np.zeros((-(-tris.shape[0] // W) * W, 3, 3), np.float32)
        padt[:tris.shape[0]] = tris
        blk = padt.reshape(-1, W, 3, 3)
        tbest = mt_best(blk[node_id], o[ray_id], d[ray_id],
                        np.full(ray_id.shape, T_MIN, np.float32),
                        best[ray_id])
        np.minimum.at(best, ray_id, tbest)
    return best, pairs + ray_id.shape[0]


def price(node_pairs_per_ray, leaf_pairs_per_ray, n_levels, n_rays_full):
    """ms for n_rays_full rays, at the optimistic (12 ns) and measured
    wide-row (47 ns) bulk gather prices."""
    node_rows = node_pairs_per_ray * n_rays_full          # 384 B rows
    leaf_rows = leaf_pairs_per_ray * n_rays_full          # 576 B rows
    # per-row price: scale the 64B/160B measurements by row size is NOT
    # how row-latency-bound gathers behave (47 ns for 160 B vs 12 ns for
    # 64 B is sublinear); bracket with [12, 47] ns for the 384/576 B rows.
    out = {}
    for tag, ns in (("optimistic 12ns/row", NS_ROW_64B),
                    ("measured-wide 47ns/row", NS_ROW_160B)):
        gather_ms = (node_rows + leaf_rows) * ns * 1e-6 \
            + FIXED_GATHER_MS * (n_levels + 1)
        vpu_ops = (node_rows * W * 30) + (leaf_rows * W * 40)
        vpu_ms = vpu_ops / VPU_OPS_PER_S * 1e3
        sort_ms = SORT_MS * n_levels
        total = gather_ms + vpu_ms + sort_ms
        out[tag] = (gather_ms, vpu_ms, total,
                    n_rays_full / (total * 1e-3) / 1e6)
    return out


def main():
    import raycore_tpu as rc
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    n_full = 1_048_576
    side = int(np.sqrt(n_sample))

    for kind in ("heightfield", "blobby"):
        if kind == "blobby":
            nt = int(np.sqrt(n_tris / 2))
            mesh = rc.blobby_mesh(n_theta=nt, n_phi=nt)
        else:
            gn = int(np.sqrt(n_tris / 2))
            mesh = rc.displaced_grid_mesh(n=gn, extent=2.0, amplitude=0.35)
        tris = np.asarray(mesh.vertices, np.float32)
        tris, levels = build_tree(tris)
        n_levels = len(levels) - 1 + 1   # expansion steps incl. root row
        lo = tris.reshape(-1, 3).min(0)
        hi = tris.reshape(-1, 3).max(0)
        xs = np.linspace(lo[0] + 1e-3, hi[0] - 1e-3, side)
        ys = np.linspace(lo[1] + 1e-3, hi[1] - 1e-3, side)
        o = np.stack(np.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2)
        o = np.concatenate(
            [o, np.full((o.shape[0], 1), hi[2] + 1.0)], 1).astype(np.float32)
        d = np.tile(np.array([0, 0, -1], np.float32), (o.shape[0], 1))

        print(f"\n=== {kind}: {tris.shape[0]} tris, tree "
              f"{[m.shape[0] for m, _ in levels][::-1]} nodes/level, "
              f"{o.shape[0]} sample rays ===")
        rows = []
        counts, leaf_pairs, best = bfs_counts(tris, levels, o, d)
        rows.append(("plain BFS", counts, leaf_pairs, 0))
        seed, seed_pairs = ordered_seed(tris, levels, o, d)
        counts2, leaf2, best2 = bfs_counts(tris, levels, o, d,
                                           seed_best=seed)
        rows.append(("ordered BFS (path-seeded)", counts2,
                     leaf2 + seed_pairs, seed_pairs))
        hit_frac = float(np.isfinite(best).mean())
        print(f"hit_frac={hit_frac:.3f} (parity sanity)")
        for name, cnt, lp, extra in rows:
            npr = (sum(cnt) + extra) / o.shape[0]
            lpr = lp / o.shape[0]
            print(f"{name}: node pairs/ray by level {cnt} "
                  f"(total {npr:.1f}/ray), leaf pairs/ray {lpr:.1f}")
            for tag, (g, v, tot, mrays) in price(
                    npr, lpr, len(cnt), n_full).items():
                print(f"  {tag:24s}: gathers {g:7.1f} ms + VPU {v:7.1f} ms"
                      f" = {tot:8.1f} ms/1M rays -> {mrays:6.2f} Mrays/s")
        # context: today's sweep engine moves ~705 (hf) / ~1196 (blobby)
        # candidates/ray through the MXU at 132-226 ms/1M rays.


if __name__ == "__main__":
    main()
