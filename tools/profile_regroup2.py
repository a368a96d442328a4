"""Micro-profiling: stage1 op-level costs, sweep shape knobs, and the
grouped (subgroup-row) combine prototype."""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import raycore_tpu as rc
from raycore_tpu.accel.dense import build_dense
from raycore_tpu.ops import pallas_regroup as prg
from raycore_tpu.ops.pallas_dense import phase_a_entry, build_worklist

n_tris_target = int(os.environ.get("RAYCORE_BENCH_TRIS", 1_000_000))
n_rays = int(os.environ.get("RAYCORE_BENCH_RAYS", 1_048_576))
TILE, G, SPB, C = 512, 32, 16, 128

grid_n = int(np.sqrt(n_tris_target / 2))
mesh = rc.displaced_grid_mesh(n=grid_n, extent=2.0, amplitude=0.35)
scene = build_dense(mesh, cluster_size=C)

side = int(np.sqrt(n_rays)); n_rays = side * side
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
SPT = TILE // G
n_sub = R // G
K = scene.n_clusters
B_cap = P_cap * SPT // SPB + K + 1


def timeit(name, fn, probe, reps=3):
    out = fn(); float(probe(out))
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = fn(); float(probe(out))
        ts.append(time.time() - t0)
    print(f"{name:40s} {min(ts)*1e3:9.2f} ms", flush=True)
    return out


# ---- stage1 op-level ----
from types import SimpleNamespace
pa = jax.jit(lambda o, d, t_min, t_max, cm, cx: phase_a_entry(
    SimpleNamespace(cluster_min=cm, cluster_max=cx), o, d, t_min, t_max,
    n_tiles, TILE, False))
entry = timeit("phase A", lambda: pa(o, d, t_min, t_max, scene.cluster_min,
                                     scene.cluster_max),
               lambda r: r[::97, ::3].sum())

wl = jax.jit(lambda entry: build_worklist(entry, P_cap))
tids, cids, coarse = timeit("build_worklist", lambda: wl(entry),
                            lambda r: r[0][::97].sum())

stats_fn = jax.jit(lambda o, d, a, b: prg.subgroup_stats(o, d, a, b, G))
stats = timeit("subgroup_stats", lambda: stats_fn(o, d, t_min, t_max),
               lambda r: r[::97, ::3].sum())

ref_fn = jax.jit(lambda stats, tids, cids, cm, cx: prg.refine_pairs(
    stats, tids, cids, cm, cx, SPT, n_tiles))
fine = timeit("refine_pairs", lambda: ref_fn(stats, tids, cids,
                                             scene.cluster_min,
                                             scene.cluster_max),
              lambda r: jnp.isfinite(r).sum())

grp_fn = jax.jit(lambda tids, cids, fine: prg.group_cluster_major(
    tids, cids, fine, SPT=SPT, SPB=SPB, n_sub=n_sub, B_cap=B_cap, K=K))
out = timeit("group_cluster_major", lambda: grp_fn(tids, cids, fine),
             lambda r: r[0][::97].sum())
block_cid, block_subs, total = out
nb = int(total)
nb_p2 = min(1 << max(9, (nb - 1).bit_length()), B_cap)
print(f"  blocks={nb} pow2={nb_p2}", flush=True)

# ---- sweep shape knobs ----
key, pair = timeit("sweep G=32 SPB=16 (exact grid)",
                   lambda: prg.run_regrouped(
                       block_subs, block_cid, prg.ray_table(o, d, t_min, t_max, G),
                       scene.tri_feats, G=G, SPB=SPB, C=C,
                       n_blocks=max(512, nb), interpret=False),
                   lambda r: r[0][::97].sum())

# SPB=32 (1024-row blocks): regroup with same candidates
grp32 = jax.jit(lambda tids, cids, fine: prg.group_cluster_major(
    tids, cids, fine, SPT=SPT, SPB=32, n_sub=n_sub,
    B_cap=P_cap * SPT // 32 + K + 1, K=K))
bc32, bs32, tot32 = grp32(tids, cids, fine)
nb32 = int(tot32)
timeit("sweep G=32 SPB=32 (1024-row blocks)",
       lambda: prg.run_regrouped(
           bs32, bc32, prg.ray_table(o, d, t_min, t_max, G),
           scene.tri_feats, G=G, SPB=32, C=C,
           n_blocks=max(512, nb32), interpret=False),
       lambda r: r[0][::97].sum())

# ---- grouped combine prototype ----
NBR = max(512, nb)  # blocks actually swept
n_rows_g = NBR * SPB            # subgroup-rows


@jax.jit
def combine_grouped(key, pair, block_subs):
    kr = key.reshape(n_rows_g, G)
    pr = pair.reshape(n_rows_g, G)
    subs = block_subs[:NBR].reshape(n_rows_g)
    order = jnp.argsort(subs)                       # 234K keys
    subs_s = jnp.take(subs, order)
    kr = jnp.take(kr, order, axis=0)
    pr = jnp.take(pr, order, axis=0)
    # log-shift segmented min over runs of equal subs (max run ~ P_cap/tile)
    shift = 1
    while shift < 64:
        same = subs_s == jnp.roll(subs_s, -shift)
        k2 = jnp.roll(kr, -shift, axis=0)
        p2 = jnp.roll(pr, -shift, axis=0)
        better = same[:, None] & (k2 < kr)
        pr = jnp.where(better, p2, pr)
        kr = jnp.where(better, k2, kr)
        shift *= 2
    # first row of each run -> per-subgroup result
    firstpos = jnp.searchsorted(subs_s, jnp.arange(n_sub, dtype=subs_s.dtype))
    hitrow = jnp.take(subs_s, jnp.minimum(firstpos, n_rows_g - 1)) \
        == jnp.arange(n_sub)
    kk = jnp.take(kr, jnp.minimum(firstpos, n_rows_g - 1), axis=0)
    pp = jnp.take(pr, jnp.minimum(firstpos, n_rows_g - 1), axis=0)
    kk = jnp.where(hitrow[:, None], kk, prg.INT32_MAX)
    pp = jnp.where(hitrow[:, None], pp, -1)
    return kk.reshape(-1), pp.reshape(-1)


ck, cp = timeit("combine grouped (argsort rows + logshift)",
                lambda: combine_grouped(key, pair, block_subs),
                lambda r: r[0][::97].sum())

# correctness vs existing sort combine
row_ray = (block_subs[:NBR, :, None] * G
           + jnp.arange(G, dtype=jnp.int32)).reshape(-1)
rk, rp = prg.combine_rows(key, pair, row_ray, R + G, method="sort")
print("grouped == sort:", bool(jnp.all(ck[:R] == rk[:R])),
      bool(jnp.all(cp[:R] == rp[:R])), flush=True)
