"""Probe: candidate counts for the cluster-major regrouped sweep (NEXT.md).

Measures, on the headline bench config, how many (subgroup, cluster)
candidates survive a per-32-ray-subgroup interval refinement of the
coarse per-tile phase A — i.e. the candidate-element reduction the
regrouped kernel would realize, before writing any kernel code.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import raycore_tpu as rc
from raycore_tpu.accel.dense import build_dense
from raycore_tpu.core.triangle import safe_invdir
from raycore_tpu.ops.pallas_dense import phase_a_entry

n_tris_target = int(os.environ.get("RAYCORE_BENCH_TRIS", 1_000_000))
n_rays = int(os.environ.get("RAYCORE_BENCH_RAYS", 1_048_576))
TILE = int(os.environ.get("RAYCORE_BENCH_TILE", 512))
G = int(os.environ.get("RAYCORE_SUBGROUP", 32))
C = int(os.environ.get("RAYCORE_BENCH_CLUSTER", 128))

grid_n = int(np.sqrt(n_tris_target / 2))
mesh = rc.displaced_grid_mesh(n=grid_n, extent=2.0, amplitude=0.35)
scene = build_dense(mesh, cluster_size=C)
K = scene.n_clusters
print(f"tris={mesh.vertices.shape[0]} K={K} C={C}")

side = int(np.sqrt(n_rays))
n_rays = side * side
xs = jnp.linspace(-0.95, 0.95, side, dtype=jnp.float32)
X, Y = jnp.meshgrid(xs, xs, indexing="ij")
o = jnp.stack([X, Y, jnp.full_like(X, 3.0)], -1)
ij = np.arange(side, dtype=np.uint64)
def _spread(v):
    v = (v | (v << 8)) & np.uint64(0x00FF00FF)
    v = (v | (v << 4)) & np.uint64(0x0F0F0F0F)
    v = (v | (v << 2)) & np.uint64(0x33333333)
    v = (v | (v << 1)) & np.uint64(0x55555555)
    return v
zi = _spread(ij)
code = (zi[:, None] << np.uint64(1)) | zi[None, :]
zperm = np.argsort(code.reshape(-1), kind="stable")
o = jnp.asarray(np.asarray(o.reshape(-1, 3))[zperm])
d = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0], jnp.float32), o.shape)
t_min = jnp.zeros((n_rays,), jnp.float32)
t_max = jnp.full((n_rays,), jnp.inf, jnp.float32)

R = n_rays
n_tiles = R // TILE
SPT = TILE // G            # subgroups per tile
n_sub = R // G


@jax.jit
def probe(o, d, t_min, t_max):
    entry = phase_a_entry(scene, o, d, t_min, t_max, n_tiles, TILE, False)
    coarse = jnp.sum(jnp.isfinite(entry))

    # Per-subgroup stats.
    invd = safe_invdir(d)
    shp = lambda a: a.reshape((n_sub, G) + a.shape[1:])
    o_lo = jnp.min(shp(o), 1); o_hi = jnp.max(shp(o), 1)
    i_lo = jnp.min(shp(invd), 1); i_hi = jnp.max(shp(invd), 1)
    tmin_lo = jnp.min(shp(t_min), 1); tmax_hi = jnp.max(shp(t_max), 1)

    # Refine every finite coarse (tile, cluster) pair against the tile's
    # SPT subgroups. Full dense here for simplicity (probe only).
    bmin = scene.cluster_min; bmax = scene.cluster_max

    def tile_refine(tile_idx, entry_row):
        # (SPT, Kc) for this tile's candidate clusters = all K (mask later)
        s0 = tile_idx * SPT
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, s0, SPT, 0)
        olo, ohi, ilo, ihi = sl(o_lo), sl(o_hi), sl(i_lo), sl(i_hi)
        tlo, thi = sl(tmin_lo), sl(tmax_hi)
        t_lo = jnp.full((SPT, K), -jnp.inf)
        t_hi = jnp.full((SPT, K), jnp.inf)
        for a in range(3):
            lo8 = jnp.full((SPT, K), jnp.inf)
            hi8 = jnp.full((SPT, K), -jnp.inf)
            for b in (bmin[:, a], bmax[:, a]):
                for oc in (olo[:, a:a+1], ohi[:, a:a+1]):
                    diff = b[None, :] - oc
                    for ic in (ilo[:, a:a+1], ihi[:, a:a+1]):
                        p = diff * ic
                        lo8 = jnp.minimum(lo8, p)
                        hi8 = jnp.maximum(hi8, p)
            t_lo = jnp.maximum(t_lo, lo8)
            t_hi = jnp.minimum(t_hi, hi8)
        e2 = jnp.maximum(t_lo, tlo[:, None])
        x2 = jnp.minimum(t_hi, thi[:, None])
        fine = (e2 <= x2) & jnp.isfinite(entry_row)[None, :]
        return jnp.sum(fine, dtype=jnp.int32)

    fine_counts = jax.lax.map(
        lambda args: tile_refine(*args),
        (jnp.arange(n_tiles), entry), batch_size=64)
    return coarse, jnp.sum(fine_counts, dtype=jnp.int64)


t0 = time.time()
coarse, fine = probe(o, d, t_min, t_max)
coarse, fine = int(coarse), int(fine)
dt = time.time() - t0
n_blocks_tile = coarse                    # current: one block per (tile=512,cid)
SPB = 512 // G
n_blocks_regroup = -(-fine // SPB) + K // 8   # + per-cluster pad slack est.
print(f"coarse pairs (TILE={TILE}): {coarse}  "
      f"candidates/ray={coarse*TILE*C/R:.0f}" if TILE else "")
print(f"fine pairs (G={G}): {fine}  candidates/ray={fine*G*C/R:.0f}")
print(f"blocks now={n_blocks_tile * (TILE//512)}  "
      f"regrouped~={n_blocks_regroup}  "
      f"ratio={(n_blocks_tile*(TILE//512))/max(n_blocks_regroup,1):.2f}x")
print(f"probe wall: {dt:.1f}s")
