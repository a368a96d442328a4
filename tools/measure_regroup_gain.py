"""Quantify the round-2 regrouping win before building it.

For the bench scene/rays, counts conservative (group, cluster) candidate
pairs at several ray-group granularities using the same interval test as
phase A. candidates/ray at group size G = pairs(G) * cluster_size * G /
n_rays; the ratio vs G=TILE is the upper bound on the regrouped sweep's
element-count reduction (NEXT.md step 1-2).

Run: `python tools/measure_regroup_gain.py [n_tris] [n_rays]`.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


@jax.jit
def _entry_at(ostats, istats, tstats, cmin, cmax):
    """Conservative slab interval test: group stats vs cluster AABBs.
    ostats/istats: (G2, 3) mins and (G2, 3) maxes stacked as (G2, 6)."""
    omin, omax = ostats[:, :3], ostats[:, 3:]
    imin, imax = istats[:, :3], istats[:, 3:]
    tmin_g, tmax_g = tstats[:, 0], tstats[:, 1]
    lo = jnp.full((omin.shape[0], cmin.shape[0]), -jnp.inf)
    hi = jnp.full((omin.shape[0], cmin.shape[0]), jnp.inf)
    for a in range(3):
        # Interval arithmetic: (bmin - o) * invd over the group's ranges.
        d0 = cmin[None, :, a] - omax[:, None, a]
        d1 = cmin[None, :, a] - omin[:, None, a]
        e0 = cmax[None, :, a] - omax[:, None, a]
        e1 = cmax[None, :, a] - omin[:, None, a]
        cands = []
        for dd in (d0, d1, e0, e1):
            cands.append(dd * imin[:, None, a])
            cands.append(dd * imax[:, None, a])
        t_lo = cands[0]
        t_hi = cands[0]
        for c in cands[1:]:
            t_lo = jnp.minimum(t_lo, c)
            t_hi = jnp.maximum(t_hi, c)
        lo = jnp.maximum(lo, t_lo)
        hi = jnp.minimum(hi, t_hi)
    lo = jnp.maximum(lo, tmin_g[:, None])
    hi = jnp.minimum(hi, tmax_g[:, None])
    return jnp.where(lo <= hi, lo, jnp.inf)    # conservative entry t


def main(n_tris_target=1_000_000, n_rays=262_144):
    import raycore_tpu as rc
    from raycore_tpu.accel.dense import build_dense
    from raycore_tpu.core.triangle import safe_invdir

    grid_n = int(np.sqrt(n_tris_target / 2))
    mesh = rc.displaced_grid_mesh(n=grid_n, extent=2.0, amplitude=0.35)
    scene = build_dense(mesh, cluster_size=128)
    C = scene.cluster_size

    side = int(np.sqrt(n_rays))
    n_rays = side * side
    xs = np.linspace(-0.95, 0.95, side, dtype=np.float32)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    o = np.stack([X, Y, np.full_like(X, 3.0)], -1)
    if os.environ.get("REGROUP_ZORDER", "1") == "1":
        # Full Morton (Z-order) pixel order: consecutive 2^k rays form a
        # near-square pixel block at EVERY scale, so every group size G in
        # the sweep below sees its best-case compact footprint.
        ij = np.arange(side, dtype=np.uint64)
        def spread(v):  # interleave bits of a 16-bit int with zeros
            v = (v | (v << 8)) & np.uint64(0x00FF00FF)
            v = (v | (v << 4)) & np.uint64(0x0F0F0F0F)
            v = (v | (v << 2)) & np.uint64(0x33333333)
            v = (v | (v << 1)) & np.uint64(0x55555555)
            return v
        zi = spread(ij)
        code = (zi[:, None] << np.uint64(1)) | zi[None, :]
        order = np.argsort(code.reshape(-1), kind="stable")
        o = o.reshape(-1, 3)[order]
        print("ray order: Z-order (square groups at every scale)")
    else:
        B = 32
        o = o.reshape(side // B, B, side // B, B, 3) \
             .transpose(0, 2, 1, 3, 4).reshape(-1, 3)
        print("ray order: 32x32 blocked scanline")
    d = np.tile(np.array([0, 0, -1.0], np.float32), (n_rays, 1))
    invd = np.asarray(safe_invdir(jnp.asarray(d)))

    cmin, cmax = jnp.asarray(scene.cluster_min), jnp.asarray(scene.cluster_max)
    print(f"{mesh.vertices.shape[0]} tris, {cmin.shape[0]} clusters x {C}; "
          f"{n_rays} rays)")

    # True best t per ray (exact engine) for the idealized pruning bound.
    from raycore_tpu.ops.pallas_dense import closest_hit_dense_pallas_auto
    import raycore_tpu as rc
    res = closest_hit_dense_pallas_auto(
        scene, rc.Ray.create(o=jnp.asarray(o), d=jnp.asarray(d)), tile=512)
    t_true = np.where(np.asarray(res.hit), np.asarray(res.t), np.inf)

    @jax.jit
    def count_pairs(ostats, istats, tstats, gmax):
        """Device-side reduction: (finite-entry count, best-t-prunable count,
        per-group finite counts histogram max) — only scalars leave device."""
        entry = _entry_at(ostats, istats, tstats, cmin, cmax)
        fin = jnp.isfinite(entry)
        per_g = fin.sum(axis=1)
        return fin.sum(), (entry <= gmax[:, None]).sum(), per_g.max(), \
            jnp.percentile(per_g.astype(jnp.float32), 99.0)

    base = None
    for G in (1024, 512, 256, 128, 64, 32, 8):
        ng = n_rays // G
        og = o.reshape(ng, G, 3)
        ig = invd.reshape(ng, G, 3)
        ostats = jnp.asarray(np.concatenate([og.min(1), og.max(1)], -1))
        istats = jnp.asarray(np.concatenate([ig.min(1), ig.max(1)], -1))
        tstats = jnp.asarray(
            np.tile(np.array([0.0, np.inf], np.float32), (ng, 1)))
        # Idealized best-t pruning: a front-to-back sweep with perfect
        # feedback only tests clusters whose conservative entry can beat
        # the slowest ray in the group.
        gmax = jnp.asarray(t_true.reshape(ng, G).max(1))
        p, pp, mx, p99 = count_pairs(ostats, istats, tstats, gmax)
        pairs, pruned = int(p), int(pp)
        cpr = pairs * C * G / n_rays
        cprp = pruned * C * G / n_rays
        if base is None:
            base = cpr
        print(f"group {G:5d}: {pairs:9d} pairs {cpr:8.0f} cand/ray "
              f"(x{base/cpr:4.2f}) | pruned: {cprp:7.0f} cand/ray "
              f"(x{base/cprp:.1f}) | max/p99 pairs-per-group "
              f"{int(mx)}/{float(p99):.0f}")


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:3]]
    main(*a)
