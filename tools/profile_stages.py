"""Stage-level decomposition of the headline closest_hit query.

Times, on the real device, the two jitted halves of the auto engine
(`_phase_a_and_worklist` and `_sweep_and_finalize`) plus the end-to-end
query, and reports the worklist statistics (pairs, candidates/ray) that
bound the MXU sweep cost. This is the round-2 optimization compass:
whatever fraction of end-to-end time the sweep takes at the measured
candidates/ray tells us how much per-ray candidate regrouping can win.

Run: `python tools/profile_stages.py [n_tris] [n_rays] [tile]`.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def timeit(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best, out


def main(n_tris_target=1_000_000, n_rays=1_048_576, tile=512):
    import raycore_tpu as rc
    from raycore_tpu.accel.dense import build_dense
    from raycore_tpu.ops import pallas_dense as pd

    grid_n = int(np.sqrt(n_tris_target / 2))
    mesh = rc.displaced_grid_mesh(n=grid_n, extent=2.0, amplitude=0.35)
    scene = build_dense(mesh, cluster_size=128)
    jax.block_until_ready(scene.tri_feats)
    K = scene.cluster_min.shape[0]

    side = int(np.sqrt(n_rays))
    n_rays = side * side
    xs = jnp.linspace(-0.95, 0.95, side, dtype=jnp.float32)
    X, Y = jnp.meshgrid(xs, xs, indexing="ij")
    o = jnp.stack([X, Y, jnp.full_like(X, 3.0)], -1)
    B = 16
    o = o.reshape(side // B, B, side // B, B, 3) \
         .transpose(0, 2, 1, 3, 4).reshape(-1, 3)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0], jnp.float32), o.shape)
    t_min = jnp.zeros((n_rays,), jnp.float32)
    t_max = jnp.full((n_rays,), jnp.inf, jnp.float32)

    n_tiles = n_rays // tile
    max_pairs = n_tiles * 64

    dt_a, parts = timeit(lambda: pd._phase_a_and_worklist(
        scene, o, d, t_min, t_max, TILE=tile, max_pairs=max_pairs,
        interpret=False))
    tids, cids, total, phi_p, tmin_p, best0_p, touched = parts
    total = int(total)
    n_blocks = 1 << max(int(np.ceil(np.log2(max(total, 1)))), 10)
    n_blocks = min(n_blocks, max_pairs)

    dt_b, res = timeit(lambda: pd._sweep_and_finalize(
        scene, tids, cids, phi_p, tmin_p, best0_p, touched,
        TILE=tile, n_blocks=n_blocks, interpret=False))

    # Same sweep with the grid cut to the next 4096-chunk multiple: the
    # delta is pure dummy-block overhead from pow2 bucketing.
    n_exact = -(-total // 4096) * 4096
    dt_bx, _ = timeit(lambda: pd._sweep_and_finalize(
        scene, tids, cids, phi_p, tmin_p, best0_p, touched,
        TILE=tile, n_blocks=n_exact, interpret=False))

    rays = rc.Ray.create(o=o, d=d)
    dt_e2e, res2 = timeit(
        lambda: pd.closest_hit_dense_pallas_auto(scene, rays, tile=tile))

    cand_per_ray = total * scene.cluster_size / n_tiles / 1.0 / tile * tile
    print(f"scene: {mesh.vertices.shape[0]} tris, {K} clusters x "
          f"{scene.cluster_size}; rays {n_rays}, tile {tile}, "
          f"tiles {n_tiles}")
    print(f"worklist: {total} pairs ({total/n_tiles:.1f}/tile), "
          f"grid {n_blocks}; candidates/ray "
          f"{total*scene.cluster_size/n_tiles:.0f} "
          f"(vs ~32 for an ideal per-ray BVH)")
    print(f"phase A + worklist build : {dt_a*1e3:8.2f} ms")
    print(f"MXU sweep + finalize     : {dt_b*1e3:8.2f} ms "
          f"(grid {n_blocks})")
    print(f"  exact-grid sweep       : {dt_bx*1e3:8.2f} ms "
          f"(grid {n_exact}; {dt_bx/n_exact*1e6:.2f} us/block)")
    print(f"end-to-end auto          : {dt_e2e*1e3:8.2f} ms "
          f"({n_rays/dt_e2e/1e6:.2f} Mrays/s)")
    print(f"hit_frac {float(jnp.mean(res2.hit)):.4f} "
          f"(stage-split {float(jnp.mean(res.hit)):.4f})")
    sweep_floor = dt_b / max(total * scene.cluster_size / n_tiles, 1)
    print(f"sweep cost per candidate/ray: {sweep_floor*1e9*n_tiles/n_rays*tile:.3f} ns"
          f" -> at 64 cand/ray the sweep would be "
          f"~{dt_b*64/(total*scene.cluster_size/n_tiles)*1e3:.1f} ms")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(x) for x in a[:3]))
