#!/usr/bin/env python
"""Benchmark harness: closest_hit throughput on the headline config.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline config (BASELINE.md): closest_hit primary rays against a
1M-triangle scene. The reference (Raycore.jl on an RX 7900 XTX) reaches
~90 Mrays/s at 1M tris / 1M rays (`benchmarks/implicitbvh_comparison.md:38`);
the north star is >=500 Mrays/s/chip on TPU v5e.

Scales down gracefully (RAYCORE_BENCH_TRIS / RAYCORE_BENCH_RAYS env vars) so
it can also run on CPU for smoke checks.
"""
import json
import os
import sys
import time

import numpy as np


def _wait_for_backend():
    """The tunneled TPU backend goes UNAVAILABLE for stretches of minutes
    to hours; a bench run burned against a dead tunnel reports rc=1 and no
    number. Probe availability in a SUBPROCESS (a failed in-process jax
    backend init is sticky) and wait, bounded by RAYCORE_BENCH_WAIT_TPU
    seconds, before the real run. On timeout, proceed and fail honestly."""
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    import subprocess
    budget = float(os.environ.get("RAYCORE_BENCH_WAIT_TPU", 1500))
    interval = 120.0
    deadline = time.time() + budget
    probe_src = ("import jax, jax.numpy as jnp\n"
                 "x = jnp.ones((8,128)) @ jnp.ones((128,8))\n"
                 "assert float(x[0,0]) == 128.0\n")
    while True:
        try:
            rc_ = subprocess.run([sys.executable, "-c", probe_src],
                                 capture_output=True, timeout=300).returncode
        except subprocess.TimeoutExpired:
            rc_ = 1
        if rc_ == 0:
            return
        if time.time() + interval > deadline:
            print(json.dumps({"warn": "TPU probe still failing after wait; "
                              "proceeding"}), file=sys.stderr)
            return
        print(json.dumps({"info": "TPU backend unavailable; waiting"}),
              file=sys.stderr)
        time.sleep(interval)


def main():
    # Persistent compile cache: tunnel-side compiles run minutes for the
    # big configs; cache them across bench processes.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
    _wait_for_backend()
    import jax
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import raycore_tpu as rc
    from raycore_tpu.scene.tlas import TLAS
    from raycore_tpu.accel import traversal as trav
    from raycore_tpu.accel.dense import build_dense, closest_hit_dense
    from raycore_tpu.ops.pallas_dense import closest_hit_dense_pallas

    n_tris_target = int(os.environ.get("RAYCORE_BENCH_TRIS", 1_000_000))
    n_rays = int(os.environ.get("RAYCORE_BENCH_RAYS", 1_048_576))
    reps = int(os.environ.get("RAYCORE_BENCH_REPS", 5))
    engine = os.environ.get("RAYCORE_BENCH_ENGINE", "regroup")
    tile = int(os.environ.get("RAYCORE_BENCH_TILE",
                              2048 if engine == "regroup" else 512))
    cluster = int(os.environ.get("RAYCORE_BENCH_CLUSTER", 128))
    select = int(os.environ.get("RAYCORE_BENCH_SELECT", 4))

    # Bench scene: "heightfield" (default; one depth layer, hit_frac ~1.0,
    # matches BASELINE's coherent primary-ray config) or "blobby" (closed
    # displaced sphere: >=2 depth layers per ray + silhouette misses — the
    # xyzrgb_dragon-class depth-complexity profile; no mesh assets can be
    # fetched in this zero-egress environment, so scanned stand-ins are
    # procedural).
    scene_kind = os.environ.get("RAYCORE_BENCH_SCENE", "heightfield")
    t0 = time.time()
    if scene_kind == "blobby":
        nt = int(np.sqrt(n_tris_target / 2))
        mesh = rc.blobby_mesh(n_theta=nt, n_phi=nt)
    else:
        grid_n = int(np.sqrt(n_tris_target / 2))
        mesh = rc.displaced_grid_mesh(n=grid_n, extent=2.0, amplitude=0.35)
    n_tris = mesh.vertices.shape[0]

    def do_build():
        # float() readbacks force real completion (see probe note below).
        if engine == "packed":
            subc = int(os.environ.get("RAYCORE_BENCH_SUBCHUNKS", 4))
            sc = build_dense(mesh, cluster_size=cluster, sub_chunks=subc)
            float(sc.tri_feats[0, 0, 0])
        elif engine.startswith("dense") or engine == "regroup":
            sc = build_dense(mesh, cluster_size=cluster)
            float(sc.tri_feats[0, 0, 0])
        else:
            mgr = TLAS()
            mgr.push(mesh, None)
            sc = mgr.sync()
            float(sc.unified_nodes[0, 0])
        return sc

    build_t0 = time.time()
    scene = do_build()
    build_cold_ms = (time.time() - build_t0) * 1e3
    # Warm build (compiles cached): the BASELINE-comparable number.
    build_t0 = time.time()
    scene = do_build()
    build_ms = (time.time() - build_t0) * 1e3

    # Primary ray grid looking down at the heightfield (the BASELINE.md
    # "coherent primary rays" configuration).
    side = int(np.sqrt(n_rays))
    n_rays = side * side
    xs = jnp.linspace(-0.95, 0.95, side, dtype=jnp.float32)
    X, Y = jnp.meshgrid(xs, xs, indexing="ij")
    o = jnp.stack([X, Y, jnp.full_like(X, 3.0)], -1)
    # Ray order: a dense-engine tile must be a spatially compact pixel
    # block, not a scanline strip. "z" (default) = Morton pixel order —
    # near-square blocks at EVERY power-of-two scale, so any kernel TILE
    # gets its best-case footprint. "block" = square B x B tiles.
    order = os.environ.get("RAYCORE_BENCH_ORDER", "z")
    B = int(os.environ.get("RAYCORE_BENCH_BLOCK", 32))
    if order == "z" and (side & (side - 1)) == 0:
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
    elif order == "block" and side % B == 0:
        o = o.reshape(side // B, B, side // B, B, 3) \
             .transpose(0, 2, 1, 3, 4).reshape(-1, 3)
    else:
        o = o.reshape(-1, 3)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0], jnp.float32), o.shape)
    rays = rc.Ray.create(o=o, d=d)

    if engine == "regroup" and n_rays < (1 << 19):
        # Tiny batches pay the regroup machinery's per-call grouping /
        # argsort overhead without amortizing it (5 s for 4K rays on CPU);
        # route them to the auto-sized worklist — the same path
        # accel/dispatch.py gives users at this size.
        engine = "dense_pallas_auto"
    if engine == "packed":
        from raycore_tpu.ops.pallas_regroup import closest_hit_packed
        G = int(os.environ.get("RAYCORE_BENCH_SUBGROUP", 32))
        packs = int(os.environ.get("RAYCORE_BENCH_PACKS", 8))
        spb_sub = int(os.environ.get("RAYCORE_BENCH_SPBSUB", 2))
        run = lambda: closest_hit_packed(scene, rays, tile=tile,
                                         subgroup=G, spb_sub=spb_sub,
                                         packs=packs, with_checksum=True)
    elif engine == "regroup":
        from raycore_tpu.ops.pallas_regroup import closest_hit_regrouped
        G = int(os.environ.get("RAYCORE_BENCH_SUBGROUP", 32))
        SPB = int(os.environ.get("RAYCORE_BENCH_SPB", 16))
        combine = os.environ.get("RAYCORE_BENCH_COMBINE", "grouped")
        passes = int(os.environ.get("RAYCORE_BENCH_PASSES", 1))
        # with_checksum: the warm path's own totals readback carries a
        # strided sum of result.t — value-dependent on the whole query,
        # i.e. the same honest barrier the probe provides, minus one
        # dispatch + one roundtrip per rep on the tunneled backend.
        run = lambda: closest_hit_regrouped(scene, rays, tile=tile,
                                            subgroup=G, spb=SPB,
                                            combine=combine, passes=passes,
                                            with_checksum=True)
    elif engine == "dense_pallas_auto":
        from raycore_tpu.ops.pallas_dense import closest_hit_dense_pallas_auto
        run = lambda: closest_hit_dense_pallas_auto(scene, rays, tile=tile)
    elif engine == "dense_pallas":
        cap = int(os.environ.get("RAYCORE_BENCH_CAP", 40))
        passes = int(os.environ.get("RAYCORE_BENCH_PASSES", 1))
        # Warmup validates capacity (raises on worklist overflow); timed
        # runs skip the host sync. On overflow, double the cap and retry.
        for attempt in range(3):
            try:
                closest_hit_dense_pallas(scene, rays, tile=tile,
                                         max_pairs_per_tile=cap,
                                         check_overflow=True, passes=passes)
                break
            except RuntimeError:
                cap *= 2
        run = lambda: closest_hit_dense_pallas(
            scene, rays, tile=tile, max_pairs_per_tile=cap,
            check_overflow=False, passes=passes)
    elif engine == "dense":
        run = lambda: closest_hit_dense(scene, rays, tile=tile,
                                        select_per_round=select)
    else:
        run = lambda: trav.closest_hit(scene, rays, tile_size=tile)
    # Force completion via a value-dependent host readback:
    # jax.block_until_ready does NOT reliably wait for remote completion on
    # the tunneled (axon) TPU backend — timings based on it can read ~0 ms
    # for 100+ ms computations. A float() pull of a reduction over the
    # result cannot return before the device has produced it.
    probe = jax.jit(lambda t: t[::257].sum())

    def run_synced():
        out = run()
        if isinstance(out, tuple):          # (res, checksum-or-None)
            res, csum = out
            if csum is None:
                float(probe(res.t))
            return res
        float(probe(out.t))
        return out

    # Warmup / compile.
    res = run_synced()
    hit_frac = float(jnp.mean(res.hit))

    times = []
    for _ in range(reps):
        t1 = time.time()
        res = run_synced()
        times.append(time.time() - t1)
    best = min(times)
    mrays = n_rays / best / 1e6

    baseline_mrays = 90.0  # RX 7900 XTX, 1M tris / 1M rays (BASELINE.md)
    result = {
        "metric": "closest_hit_primary_mrays_per_s",
        "value": round(mrays, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline_mrays, 3),
    }
    print(json.dumps(result))
    print(json.dumps({
        "detail": {
            "n_tris": int(n_tris), "n_rays": int(n_rays),
            "hit_frac": round(hit_frac, 4),
            "build_ms_warm": round(build_ms, 2),
            "build_ms_cold": round(build_cold_ms, 2),
            "best_s": round(best, 5),
            "times_s": [round(t, 5) for t in times],
            "backend": jax.default_backend(),
            "tile": tile, "engine": engine, "scene": scene_kind,
        }
    }), file=sys.stderr)


if __name__ == "__main__":
    main()
