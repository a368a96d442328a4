"""Staged TPU pipeline probe with per-stage logging.

The tunneled axon backend occasionally hangs an RPC; rerunning the probe
resumes quickly thanks to the persistent compilation cache. Each stage
prints a timestamped line so the harness can see where progress stopped.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(time.strftime("%H:%M:%S"), *a, file=sys.stderr, flush=True)


def main():
    import raycore_tpu as rc
    import jax
    import jax.numpy as jnp
    from raycore_tpu.scene.tlas import TLAS
    from raycore_tpu.accel import traversal as trav

    x = jnp.ones((8, 128))
    x.block_until_ready()
    log("warm", jax.default_backend())

    mgr = TLAS()
    mgr.push(rc.sphere_mesh(radius=1.0, n_theta=12, n_phi=24), None)
    tr = np.eye(3, 4, dtype=np.float32)
    tr[0, 3] = 3.0
    mgr.push(rc.box_mesh(), tr)
    scene = mgr.sync()
    jax.block_until_ready(scene.unified_nodes)
    log("scene ok", scene.unified_nodes.shape)

    xs = jnp.linspace(-1.5, 4.5, 64)
    X, Y = jnp.meshgrid(xs, jnp.linspace(-1.5, 1.5, 64), indexing="ij")
    o = jnp.stack([X, Y, jnp.full_like(X, -4.0)], -1)
    rays = rc.Ray.create(o=o, d=jnp.broadcast_to(jnp.array([0.0, 0, 1.0]),
                                                 o.shape))
    t0 = time.time()
    r = trav.closest_hit(scene, rays, tile_size=4096)
    jax.block_until_ready(r.t)
    log("closest_hit compile+run", round(time.time() - t0, 1),
        "hits", int(np.asarray(r.hit).sum()))
    t0 = time.time()
    r = trav.closest_hit(scene, rays, tile_size=4096)
    jax.block_until_ready(r.t)
    log("closest_hit run", round(time.time() - t0, 4))

    t0 = time.time()
    a = trav.any_hit(scene, rays, tile_size=4096)
    jax.block_until_ready(a.t)
    log("any_hit compile+run", round(time.time() - t0, 1))

    # Pallas dense kernel, compiled for real on TPU.
    from raycore_tpu.ops.pallas_brute import closest_hit_brute_pallas
    tris = rc.sphere_mesh(radius=1.0, n_theta=12, n_phi=24)
    t0 = time.time()
    rp = closest_hit_brute_pallas(tris, rays)
    jax.block_until_ready(rp.t)
    log("pallas brute compile+run", round(time.time() - t0, 1),
        "hits", int(np.asarray(rp.hit).sum()))

    log("ALL OK")


if __name__ == "__main__":
    main()
