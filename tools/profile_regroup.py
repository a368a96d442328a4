"""Stage-level timing of the regrouped engine on the headline config.

Times (with value-dependent readbacks — block_until_ready lies on the
tunneled backend): stage1 (phase A + refine + group), the Pallas sweep
alone, the combine alone, and the fused stage2.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import raycore_tpu as rc
from raycore_tpu.accel.dense import build_dense
from raycore_tpu.ops import pallas_regroup as prg

n_tris_target = int(os.environ.get("RAYCORE_BENCH_TRIS", 1_000_000))
n_rays = int(os.environ.get("RAYCORE_BENCH_RAYS", 1_048_576))
TILE = int(os.environ.get("RAYCORE_BENCH_TILE", 512))
G = int(os.environ.get("RAYCORE_BENCH_SUBGROUP", 32))
SPB = int(os.environ.get("RAYCORE_BENCH_SPB", 16))
C = int(os.environ.get("RAYCORE_BENCH_CLUSTER", 128))

grid_n = int(np.sqrt(n_tris_target / 2))
mesh = rc.displaced_grid_mesh(n=grid_n, extent=2.0, amplitude=0.35)
scene = build_dense(mesh, cluster_size=C)

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
P_cap = min(48 * n_tiles, n_tiles * scene.n_clusters)


def timeit(name, fn, probe, reps=3):
    fn_out = fn()
    float(probe(fn_out))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        float(probe(out))
        ts.append(time.time() - t0)
    print(f"{name:34s} {min(ts)*1e3:9.2f} ms", flush=True)
    return fn_out


s1 = lambda: prg._stage1(scene, o, d, t_min, t_max, TILE=TILE, G=G,
                         SPB=SPB, P_cap=P_cap, interpret=False)
out1 = timeit("stage1 (phaseA+refine+group)", s1,
              lambda r: r[0][::97].sum())
block_cid, block_subs, tbl, total, coarse = out1
print(f"  coarse pairs={int(coarse)} blocks={int(total)} "
      f"rows={int(total)*G*SPB}", flush=True)
nb = int(total)
nb_p2 = 1 << max(9, (max(nb, 1) - 1).bit_length())
nb_p2 = min(nb_p2, block_cid.shape[0])
print(f"  nb pow2 grid: {nb_p2}")

# run_regrouped is itself jitted — call it directly (wrapping it in an
# outer jit closure would bake the feats array into the compile payload).
kp = timeit("sweep (pallas kernel only)",
            lambda: prg.run_regrouped(
                block_subs, block_cid, tbl, scene.tri_feats, G=G, SPB=SPB,
                C=C, n_blocks=nb_p2, interpret=False),
            lambda r: r[0][::97].sum())
key, pair = kp

timeit("sweep (exact grid)",
       lambda: prg.run_regrouped(
           block_subs, block_cid, tbl, scene.tri_feats, G=G, SPB=SPB,
           C=C, n_blocks=max(512, nb), interpret=False),
       lambda r: r[0][::97].sum())


@jax.jit
def comb_sort(key, pair, block_subs):
    row_ray = (block_subs[:nb_p2, :, None] * G
               + jnp.arange(G, dtype=jnp.int32)).reshape(-1)
    return prg.combine_rows(key, pair, row_ray, R + G, method="sort")


@jax.jit
def comb_seg(key, pair, block_subs):
    row_ray = (block_subs[:nb_p2, :, None] * G
               + jnp.arange(G, dtype=jnp.int32)).reshape(-1)
    return prg.combine_rows(key, pair, row_ray, R + G, method="segment")


timeit("combine (sort)", lambda: comb_sort(key, pair, block_subs),
       lambda r: r[0][::97].sum())
timeit("combine (segment)", lambda: comb_seg(key, pair, block_subs),
       lambda r: r[0][::97].sum())

s2 = lambda: prg._stage2(scene, block_cid, block_subs, tbl, o, d,
                         G=G, SPB=SPB, n_blocks=nb_p2, interpret=False,
                         combine="sort")
timeit("stage2 fused (sweep+combine+fin)", s2, lambda r: r.t[::257].sum())
