"""Warm-frame timing for the staged path tracer (VERDICT r3 task 4
done-bar: warm 1024x1024 / 4-bounce / 1M-tri frame < 10 s, from the
round-2 30.3 s measured with the tile-worklist engine).

Workload: BASELINE config #5 shape — 1M-tri displaced heightfield,
1024x1024, spp=1, 4 bounces, 2 point lights, mixed matte/metal
materials. Timing via a value-dependent host readback of the image
(block_until_ready lies on the tunneled backend — see bench.py).

Usage (TPU): python tools/tpu_pathtracer_bench.py [side] [n_tris]
Smoke (CPU): RAYCORE_PT_SMOKE=1 python tools/tpu_pathtracer_bench.py

RAYCORE_PT_PHASE splits the run into resumable batch entries (the r5a
single-entry run burned its whole 90-min timebox against a mid-entry
tunnel outage; each phase rides the persistent JAX compile cache, so a
killed phase re-run resumes deeper into the compile chain):
  prewarm_closest | prewarm_anyhit | frames | pipelined | all (default)
"""
import os
import sys
import time

if os.environ.get("RAYCORE_PT_SMOKE") and os.environ.get(
        "PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    del env["PALLAS_AXON_POOL_IPS"]
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np

import raycore_tpu as rc
from raycore_tpu.accel.dense import build_dense
from raycore_tpu.render.pathtracer import PTConfig, trace_paths_staged
from raycore_tpu.render.wavefront import Materials, PointLights, Camera


def main():
    smoke = bool(os.environ.get("RAYCORE_PT_SMOKE"))
    phase = os.environ.get("RAYCORE_PT_PHASE", "all")
    side = int(sys.argv[1]) if len(sys.argv) > 1 else (64 if smoke else 1024)
    n_tris = int(sys.argv[2]) if len(sys.argv) > 2 else (
        20_000 if smoke else 1_000_000)
    grid_n = int(np.sqrt(n_tris / 2))
    mesh = rc.displaced_grid_mesh(n=grid_n, extent=2.0, amplitude=0.35)
    # Two materials in a checker pattern over triangle index.
    meta = (jnp.arange(mesh.batch_shape[0], dtype=jnp.uint32) // 64) % 2
    mesh = mesh.replace(metadata=meta)
    # cluster_size follows the part-F device A/B winner (C=256, the
    # product default; RAYCORE_PT_CLUSTER overrides for A/Bs). The
    # frame's 1M-ray closest query is the SAME shape as the headline
    # bench, so a post-part-F machine already has its graphs cached.
    scene = build_dense(mesh, cluster_size=int(
        os.environ.get("RAYCORE_PT_CLUSTER", "256")))
    float(scene.tri_feats[0, 0, 0])
    print(f"{mesh.batch_shape[0]} tris, {side}x{side}, 4 bounces, "
          f"backend={jax.default_backend()}", flush=True)

    mats = Materials.create(
        base_color=np.array([[0.75, 0.72, 0.68], [0.9, 0.85, 0.8]],
                            np.float32),
        metallic=np.array([0.0, 0.85], np.float32),
        roughness=np.array([0.8, 0.15], np.float32))
    lights = PointLights(
        position=jnp.asarray([[2.5, -2.5, 4.0], [-2.0, 2.0, 3.5]],
                             jnp.float32),
        intensity=jnp.asarray([[18.0, 17.0, 16.0], [6.0, 7.0, 9.0]],
                              jnp.float32))
    cam = Camera.create(position=(0.0, -3.2, 2.4), target=(0.0, 0.0, 0.3),
                        up=(0, 0, 1), fov_deg=55.0)
    cfg = PTConfig(width=side, height=side, spp=1, bounces=4,
                   tile_size=2048)

    # Warm the regrouped engines for the frame's query shape so dispatch
    # auto-routes every bounce's closest/occlusion query to the fastest
    # engine (the product-default story: prewarm once, then all renderer
    # pipelines ride the warm fused paths — accel/dispatch.py).
    # Step-wise with progress prints: the r5a batch entry died inside a
    # single opaque rc.prewarm call after 85 min (remote compile or
    # tunnel hang) — per-step timestamps localize the long pole.
    from raycore_tpu.ops.pallas_regroup import (closest_hit_regrouped,
                                                any_hit_regrouped)
    R = side * side * cfg.spp
    lo, hi = np.asarray(scene.root_aabb)
    g = int(np.sqrt(R))
    xs = jnp.linspace(lo[0], hi[0], g)
    ys = jnp.linspace(lo[1], hi[1], g)
    X, Y = jnp.meshgrid(xs, ys, indexing="ij")
    po = jnp.stack([X, Y, jnp.full_like(X, hi[2] + 1.0)], -1).reshape(-1, 3)
    po = jnp.tile(po, (-(-R // po.shape[0]), 1))[:R]
    pd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32),
                          po.shape)
    pr = rc.Ray.create(o=po, d=pd)
    steps = (("closest cold", 0), ("closest warm(fused)", 0),
             ("anyhit cold", 1), ("anyhit warm(fused)", 1))
    if phase == "prewarm_closest":
        steps = steps[:2]
    elif phase == "prewarm_anyhit":
        steps = steps[2:]
    elif phase in ("frames", "pipelined"):
        steps = ()
    for label, q in steps:
        t0 = time.time()
        if q == 0:
            closest_hit_regrouped(scene, pr, tile=2048, passes="auto")
        else:
            any_hit_regrouped(scene, pr, tile=2048)
        print(f"prewarm {label}: {time.time() - t0:.1f} s", flush=True)
    if phase in ("prewarm_closest", "prewarm_anyhit"):
        print(f"phase {phase} done", flush=True)
        return

    def frame(i, pipelined=False):
        img = trace_paths_staged(scene, mats, lights, cam,
                                 jax.random.PRNGKey(i), cfg,
                                 pipelined=pipelined)
        # Value-dependent readback = honest completion barrier.
        return float(jnp.sum(img[::7, ::7].astype(jnp.float32))), img

    rays = side * side * cfg.bounces * 2      # closest + shadow per bounce
    if phase == "pipelined":
        # Warm reference frame only (frames phase already recorded the
        # synced timings; its graphs are in the persistent cache).
        # Min-of-N synced reference, matching the pipelined loop's
        # methodology (a single first-sample reference still absorbs
        # executable loads and would overstate the pipelining win). The
        # LAST iteration uses the pipelined loop's final key so the
        # bit-identity check below compares same-key frames.
        n_ref = 3 if not smoke else 1
        ref_i = 3 if not smoke else 1   # = the pipelined loop's last key
        best = float("inf")
        for j in range(n_ref):
            i = ref_i if j == n_ref - 1 else j
            t0 = time.time()
            s, img = frame(i)
            best = min(best, time.time() - t0)
        print(f"synced reference (min of {n_ref}): {best:.2f} s "
              f"(checksum {s:.3f})", flush=True)
    else:
        t0 = time.time()
        s, img = frame(0)
        cold = time.time() - t0
        print(f"cold frame: {cold:.2f} s (checksum {s:.3f})", flush=True)
        warms = []
        for i in range(1, 4 if not smoke else 2):
            t0 = time.time()
            s, img = frame(i)
            warms.append(time.time() - t0)
            print(f"warm frame {i}: {warms[-1]:.2f} s", flush=True)
        best = min(warms)
        print(f"best warm: {best:.2f} s  (~{rays / best / 1e6:.2f} Mrays/s "
              f"over {rays / 1e6:.1f}M queries/frame)", flush=True)
        arr = np.asarray(img)
        assert arr.std() > 0.01 and 0.0 <= arr.min() and arr.max() <= 1.0
        print("image sanity ok")
        if phase == "frames":
            print("phase frames done", flush=True)
            return

    # Pipelined A/B: same frames through the deferred whole-frame query
    # chain (one capacity sync per frame instead of one per query).
    pip = []
    for i in range(1, 4 if not smoke else 2):
        t0 = time.time()
        s_p, img_p = frame(i, pipelined=True)
        pip.append(time.time() - t0)
        print(f"pipelined frame {i}: {pip[-1]:.2f} s "
              f"(checksum {s_p:.3f})", flush=True)
    best_p = min(pip)
    print(f"best pipelined: {best_p:.2f} s  "
          f"(~{rays / best_p / 1e6:.2f} Mrays/s; "
          f"{best / best_p:.2f}x vs per-query sync)", flush=True)
    arr_p = np.asarray(img_p)
    assert np.array_equal(arr_p, np.asarray(img)), \
        "pipelined frame must be bit-identical to the synced frame"
    print("pipelined image identical ok")


if __name__ == "__main__":
    main()
