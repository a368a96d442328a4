"""Stage-wise isolation of the traversal crash on the axon TPU backend."""
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

    x = jnp.ones((8, 128))
    x.block_until_ready()
    log("warm")

    # Stage 1: synthetic batched stack machine (while_loop + masked stack
    # writes + take_along_axis pops) with no scene data.
    R, S = 1024, 64

    def synth():
        init = dict(node=jnp.zeros((R,), jnp.int32),
                    stack=jnp.full((R, S), -1, jnp.int32),
                    sptr=jnp.zeros((R,), jnp.int32),
                    iters=jnp.int32(0))
        slots = jnp.arange(S, dtype=jnp.int32)[None, :]

        def cond(s):
            return jnp.any(s["node"] != -1) & (s["iters"] < 200)

        def body(s):
            node = s["node"]
            active = node != -1
            push = active & (s["iters"] % 3 != 2)
            sptr1 = jnp.where(push, s["sptr"] + 1, s["sptr"])
            wm = (slots == jnp.clip(sptr1, 0, S - 1)[:, None]) & push[:, None]
            stack = jnp.where(wm, (node + 1)[:, None], s["stack"])
            top = jnp.take_along_axis(
                stack, jnp.clip(sptr1, 0, S - 1)[:, None], 1)[:, 0]
            pop = active & ~push
            node2 = jnp.where(pop, jnp.where(sptr1 > 0, top, -1),
                              jnp.where(active, node + 1, node))
            node2 = jnp.where(node2 > 100, -1, node2)
            sptr2 = jnp.where(pop & (sptr1 > 0), sptr1 - 1, sptr1)
            return dict(node=node2, stack=stack, sptr=sptr2,
                        iters=s["iters"] + 1)

        return jax.lax.while_loop(cond, body, init)["iters"]

    it = jax.jit(synth)()
    it.block_until_ready()
    log("stage1 synth stack machine ok, iters", int(it))

    # Build the scene (cached compiles by now).
    mgr = TLAS()
    mgr.push(rc.sphere_mesh(radius=1.0, n_theta=12, n_phi=24), None)
    tr = np.eye(3, 4, dtype=np.float32)
    tr[0, 3] = 3.0
    mgr.push(rc.box_mesh(), tr)
    scene = mgr.sync()
    jax.block_until_ready(scene.unified_nodes)
    log("scene ok")

    # Stage 2: single tile, no lax.map.
    from raycore_tpu.accel.traversal import _traverse_tile
    xs = jnp.linspace(-1.5, 4.5, 32)
    X, Y = jnp.meshgrid(xs, jnp.linspace(-1.5, 1.5, 32), indexing="ij")
    o = jnp.stack([X, Y, jnp.full_like(X, -4.0)], -1).reshape(-1, 3)
    d = jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), o.shape)
    tmin = jnp.zeros((1024,))
    tmax = jnp.full((1024,), jnp.inf)
    f = jax.jit(lambda sc, o, d, a, b: _traverse_tile(
        sc, o, d, a, b, any_hit=False, stack_size=64, max_iters=1 << 17))
    out = f(scene, o, d, tmin, tmax)
    jax.block_until_ready(out)
    log("stage2 raw tile ok, hits", int((np.asarray(out[0]) >= 0).sum()))

    # Stage 3: full closest_hit (lax.map over tiles).
    from raycore_tpu.accel import traversal as trav
    rays = rc.Ray.create(o=o.reshape(32, 32, 3), d=d.reshape(32, 32, 3))
    r = trav.closest_hit(scene, rays, tile_size=256)
    jax.block_until_ready(r.t)
    log("stage3 closest_hit(map) ok, hits", int(np.asarray(r.hit).sum()))

    t0 = time.time()
    r = trav.closest_hit(scene, rays, tile_size=256)
    jax.block_until_ready(r.t)
    log("steady", round(time.time() - t0, 4))
    log("ALL OK")


if __name__ == "__main__":
    main()
