"""Drive the round-2 additions end-to-end on the real TPU.

Covers: baked-scene instance identity (DenseScene.instance_of_prim
through both finalizers), the dedicated occlusion kernel
(any_hit_dense_pallas_auto via scene_any_hit dispatch), and the
traversal stack-overflow detect+retry path. Timings use value-dependent
readbacks (block_until_ready does not wait on the tunneled backend).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np

import raycore_tpu as rc
from raycore_tpu.scene.tlas import TLAS
from raycore_tpu.scene.bake import bake_dense
from raycore_tpu.accel import dispatch as disp


def main():
    print("devices:", jax.devices())
    mgr = TLAS()
    mgr.push(rc.sphere_mesh(radius=1.0, n_theta=24, n_phi=48), None)
    tr = np.eye(3, 4, dtype=np.float32)
    tr[0, 3] = 3.0
    mgr.push(rc.box_mesh(), tr)
    tlas = mgr.sync()
    ds = bake_dense(mgr, cluster_size=128)

    side = 256
    xs = jnp.linspace(-1.8, 4.2, side, dtype=jnp.float32)
    X, Y = jnp.meshgrid(xs, jnp.linspace(-1.5, 1.5, side), indexing="ij")
    o = jnp.stack([X, Y, jnp.full_like(X, -4.0)], -1).reshape(-1, 3)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), o.shape)
    rays = rc.Ray.create(o=o, d=d)

    # 1) Baked instance identity vs the TLAS traversal.
    rt = rc.closest_hit(tlas, rays, tile_size=4096)
    rd = disp.scene_closest_hit(ds, rays)
    ht, hd = np.asarray(rt.hit), np.asarray(rd.hit)
    it_, id_ = np.asarray(rt.instance_idx), np.asarray(rd.instance_idx)
    assert (ht == hd).all(), f"hit mismatch: {(ht != hd).sum()}"
    m = ht
    agree = (it_[m] == id_[m]).mean()
    print(f"instance identity: {m.sum()} hits, agreement {agree:.4f}")
    assert agree == 1.0

    # 2) Occlusion kernel: boolean parity + timing vs closest hit.
    probe = jax.jit(lambda t: t[::17].astype(jnp.float32).sum())
    occ = disp.scene_any_hit(ds, rays)
    float(probe(occ.hit))
    t0 = time.perf_counter()
    for _ in range(5):
        occ = disp.scene_any_hit(ds, rays)
        float(probe(occ.hit))
    t_occ = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(5):
        rd2 = disp.scene_closest_hit(ds, rays)
        float(probe(rd2.t))
    t_ch = (time.perf_counter() - t0) / 5
    ho = np.asarray(occ.hit)
    assert (ho == hd).all(), f"occlusion mask mismatch: {(ho != hd).sum()}"
    io = np.asarray(occ.instance_idx)
    assert (io[m] == id_[m]).all()
    print(f"occlusion: mask parity OK; any_hit {t_occ*1e3:.2f} ms vs "
          f"closest_hit {t_ch*1e3:.2f} ms per {o.shape[0]} rays")

    # 3) Stack overflow detect + retry on TPU (tiny stack forces it).
    from raycore_tpu.accel import traversal as trav
    r_small = trav.closest_hit(tlas, rays, stack_size=4, tile_size=4096)
    np.testing.assert_array_equal(np.asarray(r_small.hit), ht)
    tm = np.asarray(rt.t)[m]
    ts = np.asarray(r_small.t)[m]
    np.testing.assert_allclose(ts, tm, rtol=1e-4, atol=1e-5)
    print("stack overflow retry: parity OK at stack_size=4")
    print("ALL OK")


if __name__ == "__main__":
    main()
