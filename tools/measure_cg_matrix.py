"""Candidate-count matrix over (cluster_size C, subgroup G).

The regroup engine's sweep cost is ~ blocks x per-block cost, and
blocks = pairs / SPB where pairs = conservative (subgroup, cluster)
candidates. candidates/ray = pairs * C * G / n_rays. This probe measures
the matrix on CPU (pure geometry — no kernels) so only the winning
configs pay the multi-minute tunneled TPU compiles.

Run: python tools/measure_cg_matrix.py [n_tris] [n_rays]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main(n_tris_target=1_000_000, n_rays=262_144):
    import raycore_tpu as rc
    from raycore_tpu.accel.dense import build_dense
    from raycore_tpu.core.triangle import safe_invdir
    from tools.measure_regroup_gain import _entry_at

    grid_n = int(np.sqrt(n_tris_target / 2))
    mesh = rc.displaced_grid_mesh(n=grid_n, extent=2.0, amplitude=0.35)

    side = int(np.sqrt(n_rays))
    n_rays = side * side
    xs = np.linspace(-0.95, 0.95, side, dtype=np.float32)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    o = np.stack([X, Y, np.full_like(X, 3.0)], -1)
    ij = np.arange(side, dtype=np.uint64)

    def spread(v):
        v = (v | (v << 8)) & np.uint64(0x00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x33333333)
        v = (v | (v << 1)) & np.uint64(0x55555555)
        return v

    zi = spread(ij)
    code = (zi[:, None] << np.uint64(1)) | zi[None, :]
    order = np.argsort(code.reshape(-1), kind="stable")
    o = o.reshape(-1, 3)[order]
    d = np.tile(np.array([0, 0, -1.0], np.float32), (n_rays, 1))
    invd = np.asarray(safe_invdir(jnp.asarray(d)))

    print(f"{mesh.vertices.shape[0]} tris, {n_rays} Z-order rays")
    for C in (32, 64, 128, 256):
        scene = build_dense(mesh, cluster_size=C)
        cmin = jnp.asarray(scene.cluster_min)
        cmax = jnp.asarray(scene.cluster_max)
        K = cmin.shape[0]

        @jax.jit
        def count_pairs(ostats, istats, tstats, cmin=cmin, cmax=cmax):
            entry = _entry_at(ostats, istats, tstats, cmin, cmax)
            fin = jnp.isfinite(entry)
            return fin.sum()

        for G in (8, 16, 32):
            ng = n_rays // G
            og = o.reshape(ng, G, 3)
            ig = invd.reshape(ng, G, 3)
            ostats = jnp.asarray(np.concatenate([og.min(1), og.max(1)], -1))
            istats = jnp.asarray(np.concatenate([ig.min(1), ig.max(1)], -1))
            tstats = jnp.asarray(
                np.tile(np.array([0.0, np.inf], np.float32), (ng, 1)))
            pairs = int(count_pairs(ostats, istats, tstats))
            cpr = pairs * C * G / n_rays
            # Sweep model: blocks at SPB rows of G rays (ROWS=G*SPB=512);
            # per-block ~ max(fixed 2us, matmul elems) — crude, relative.
            spb = max(1, 512 // G)
            blocks = pairs / spb
            print(f"  C={C:4d} K={K:6d} G={G:3d}: {pairs:9d} pairs  "
                  f"{cpr:7.0f} cand/ray  {blocks:9.0f} blocks(SPB={spb})")


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
