#!/usr/bin/env python
"""Benchmark harness: closest_hit throughput on the headline config.

Prints ONE JSON line (the LAST line on stdout):
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline config (BASELINE.md): closest_hit primary rays against a
1M-triangle scene. The reference (Raycore.jl on an RX 7900 XTX) reaches
~90 Mrays/s at 1M tris / 1M rays (`benchmarks/implicitbvh_comparison.md:38`);
the north star is >=500 Mrays/s/chip on TPU v5e.

Robustness contract (round-3 hardening; VERDICT.md "Next round" #3):
the harness can NEVER time out or crash its caller. Structure:

  supervisor (this process, pure stdlib, never imports jax)
    spawns -> inner worker (``bench.py --inner``) which does the real run
              and checkpoints partial results to a file after the build,
              after warmup, and after every timed rep.

The supervisor enforces a hard wall-clock deadline (RAYCORE_BENCH_DEADLINE,
default 1200 s). If the worker finishes, its result is printed. If the
worker hangs (dead TPU tunnel, runaway compile) or dies, the supervisor
kills it and prints the last checkpoint — or an explicit
{"value": 0.0, "error": ...} line — and ALWAYS exits 0. The inner worker
itself bounds its TPU wait to RAYCORE_BENCH_WAIT_TPU (default 240 s,
probed in 75 s subprocess attempts: a failed in-process jax init is
sticky, and a dead tunnel makes `import jax` HANG rather than fail).

Scales down gracefully (RAYCORE_BENCH_TRIS / RAYCORE_BENCH_RAYS env vars) so
it can also run on CPU for smoke checks.
"""
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

METRIC = "closest_hit_primary_mrays_per_s"
BASELINE_MRAYS = 90.0  # RX 7900 XTX, 1M tris / 1M rays (BASELINE.md)


def _result_line(value, error=None, **extra):
    out = {
        "metric": METRIC,
        "value": round(float(value), 4),
        "unit": "Mrays/s",
        "vs_baseline": round(float(value) / BASELINE_MRAYS, 3),
    }
    if error:
        out["error"] = error
    out.update(extra)
    return out


def _write_checkpoint(path, obj):
    """Atomic write so the supervisor never reads a torn file."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


# --------------------------------------------------------------------------
# Supervisor
# --------------------------------------------------------------------------

def supervise():
    deadline_s = float(os.environ.get("RAYCORE_BENCH_DEADLINE", 1200))
    t_start = time.time()
    ckpt = tempfile.mktemp(prefix="raycore_bench_", suffix=".json")
    env = dict(os.environ)
    env["RAYCORE_BENCH_CKPT"] = ckpt
    # Inner gets a slightly earlier deadline so it can finish cleanly.
    env["RAYCORE_BENCH_INNER_DEADLINE"] = str(t_start + deadline_s - 20.0)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--inner"],
        env=env, stdout=subprocess.DEVNULL, stderr=None,
        start_new_session=True)

    killed_reason = None
    while True:
        rc = proc.poll()
        if rc is not None:
            if rc != 0:
                killed_reason = f"inner-exit-{rc}"
            break
        if time.time() - t_start > deadline_s:
            killed_reason = "deadline"
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                proc.kill()
            try:
                proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                pass
            break
        time.sleep(1.0)

    result = None
    try:
        with open(ckpt) as f:
            result = json.load(f)
    except (OSError, ValueError):
        result = None
    finally:
        for p in (ckpt, ckpt + ".tmp"):
            try:
                os.unlink(p)
            except OSError:
                pass

    if result is None:
        result = _result_line(
            0.0, error=killed_reason or "no-checkpoint",
            stage="none")
    elif killed_reason and "error" not in result:
        # Partial checkpoint from a killed/failed run: keep the number,
        # flag how far it got.
        result["error"] = f"partial:{killed_reason}"
    print(json.dumps(result), flush=True)
    return 0


# --------------------------------------------------------------------------
# Inner worker
# --------------------------------------------------------------------------

def _remaining():
    dl = float(os.environ.get("RAYCORE_BENCH_INNER_DEADLINE", time.time() + 3600))
    return dl - time.time()


def _wait_for_backend(ckpt):
    """The tunneled TPU backend goes UNAVAILABLE for stretches of minutes
    to hours. Probe availability in a SUBPROCESS (a failed in-process jax
    backend init is sticky, and a dead tunnel can make import jax HANG),
    bounded by RAYCORE_BENCH_WAIT_TPU seconds. Returns True if the backend
    answered, False if we gave up."""
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return True
    budget = float(os.environ.get("RAYCORE_BENCH_WAIT_TPU", 240))
    budget = min(budget, max(_remaining() - 60.0, 0.0))
    deadline = time.time() + budget
    probe_src = ("import jax, jax.numpy as jnp\n"
                 "x = jnp.ones((8,128)) @ jnp.ones((128,8))\n"
                 "assert float(x[0,0]) == 128.0\n")
    while True:
        try:
            rc_ = subprocess.run([sys.executable, "-c", probe_src],
                                 capture_output=True, timeout=75).returncode
        except subprocess.TimeoutExpired:
            rc_ = 1
        if rc_ == 0:
            return True
        if time.time() + 30.0 > deadline:
            return False
        print(json.dumps({"info": "TPU backend unavailable; waiting"}),
              file=sys.stderr, flush=True)
        time.sleep(min(30.0, max(deadline - time.time(), 1.0)))


def inner():
    ckpt = os.environ["RAYCORE_BENCH_CKPT"]
    _write_checkpoint(ckpt, _result_line(0.0, error="tpu-unavailable",
                                         stage="probing"))
    # Persistent compile cache: tunnel-side compiles run minutes for the
    # big configs; cache them across bench processes.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
    if not _wait_for_backend(ckpt):
        # Dead tunnel: report honestly, rc=0 (VERDICT.md round-3 item 3).
        _write_checkpoint(ckpt, _result_line(0.0, error="tpu-unavailable",
                                             stage="backend-wait"))
        return 0
    _write_checkpoint(ckpt, _result_line(0.0, error="died-in-import",
                                         stage="import"))

    import numpy as np
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
                              2048 if engine in ("regroup", "auto",
                                                 "occlusion") else 512))
    # cluster_size default 256 = the product default (accel/dense.py) and
    # the part-F device A/B winner: 9.31 Mrays/s vs 8.50 same-batch C=128
    # control at the 1M/1M headline (fewer, larger blocks halve the
    # per-block MXU issue count at 1.19x candidate volume; C=512 gives
    # the tax back — docs/evidence/r5f/).
    cluster = int(os.environ.get("RAYCORE_BENCH_CLUSTER", 256))
    select = int(os.environ.get("RAYCORE_BENCH_SELECT", 4))

    def checkpoint(stage, value=0.0, error=None, **extra):
        _write_checkpoint(ckpt, _result_line(value, error=error,
                                             stage=stage, **extra))

    # Bench scene: "heightfield" (default; one depth layer, hit_frac ~1.0,
    # matches BASELINE's coherent primary-ray config) or "blobby" (closed
    # displaced sphere: >=2 depth layers per ray + silhouette misses — the
    # xyzrgb_dragon-class depth-complexity profile; no mesh assets can be
    # fetched in this zero-egress environment, so scanned stand-ins are
    # procedural).
    scene_kind = os.environ.get("RAYCORE_BENCH_SCENE", "heightfield")
    checkpoint("mesh", error="died-in-mesh-gen")
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
        elif engine.startswith("dense") or engine in ("regroup", "auto",
                                                      "occlusion"):
            sc = build_dense(mesh, cluster_size=cluster)
            float(sc.tri_feats[0, 0, 0])
        else:
            mgr = TLAS()
            mgr.push(mesh, None)
            sc = mgr.sync()
            float(sc.unified_nodes[0, 0])
        return sc

    checkpoint("build", error="died-in-build")
    build_t0 = time.time()
    scene = do_build()
    build_cold_ms = (time.time() - build_t0) * 1e3
    # Warm build (compiles cached): the BASELINE-comparable number.
    build_t0 = time.time()
    scene = do_build()
    build_ms = (time.time() - build_t0) * 1e3
    checkpoint("built", error="died-before-warmup",
               build_ms_warm=round(build_ms, 2),
               build_ms_cold=round(build_cold_ms, 2))

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
    run_deferred = None
    if engine == "packed":
        from raycore_tpu.ops.pallas_regroup import closest_hit_packed
        G = int(os.environ.get("RAYCORE_BENCH_SUBGROUP", 32))
        packs = int(os.environ.get("RAYCORE_BENCH_PACKS", 8))
        spb_sub = int(os.environ.get("RAYCORE_BENCH_SPBSUB", 2))
        run = lambda: closest_hit_packed(scene, rays, tile=tile,
                                         subgroup=G, spb_sub=spb_sub,
                                         packs=packs, with_checksum=True)
        run_deferred = lambda: closest_hit_packed(
            scene, rays, tile=tile, subgroup=G, spb_sub=spb_sub,
            packs=packs, deferred=True)
    elif engine == "regroup":
        from raycore_tpu.ops.pallas_regroup import closest_hit_regrouped
        G = int(os.environ.get("RAYCORE_BENCH_SUBGROUP", 32))
        SPB = int(os.environ.get("RAYCORE_BENCH_SPB", 16))
        combine = os.environ.get("RAYCORE_BENCH_COMBINE", "grouped")
        passes = int(os.environ.get("RAYCORE_BENCH_PASSES", 1))
        # payload=slim skips the 160 B/ray triangle-payload gather
        # (hit/t/prim/instance/metadata stay exact) — the analysis-
        # pipeline (view_factors/AO) cost point.
        payload = os.environ.get("RAYCORE_BENCH_PAYLOAD", "full")
        # with_checksum: the warm path's own totals readback carries a
        # strided sum of result.t — value-dependent on the whole query,
        # i.e. the same honest barrier the probe provides, minus one
        # dispatch + one roundtrip per rep on the tunneled backend.
        run = lambda: closest_hit_regrouped(scene, rays, tile=tile,
                                            subgroup=G, spb=SPB,
                                            combine=combine, passes=passes,
                                            payload=payload,
                                            with_checksum=True)
        run_deferred = lambda: closest_hit_regrouped(
            scene, rays, tile=tile, subgroup=G, spb=SPB, combine=combine,
            passes=passes, payload=payload, deferred=True)
    elif engine == "auto":
        # Product-default path: rc.closest_hit dispatches by scene form
        # and warm-capacity state (accel/dispatch.py). Prewarm once so
        # the timed reps measure dispatch routing to the warmed fused
        # engine — the number a renderer pipeline actually sees
        # (VERDICT r4 task 3: bench exercises dispatch itself).
        from raycore_tpu.ops.pallas_regroup import prewarm
        prewarm(scene, n_rays)
        run = lambda: rc.closest_hit(scene, rays)
    elif engine == "occlusion":
        # any_hit over the same config: per-subgroup candidates, no
        # payload finalize (reference any_hit early-exit semantics).
        from raycore_tpu.ops.pallas_regroup import any_hit_regrouped
        run = lambda: any_hit_regrouped(scene, rays, tile=tile,
                                        with_checksum=True)
        run_deferred = lambda: any_hit_regrouped(scene, rays, tile=tile,
                                                 deferred=True)
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
        run_deferred = lambda: (run(), None)   # no internal host syncs
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
    # Occlusion results carry t == 0 (constant — XLA would fold a t-sum
    # without running the query); probe the occluder ids instead.
    if engine == "occlusion":
        carrier = lambda r: r.prim_idx.astype(jnp.float32)
    else:
        carrier = lambda r: r.t

    def run_synced():
        out = run()
        if isinstance(out, tuple):          # (res, checksum-or-None)
            res, csum = out
            if csum is None:
                float(probe(carrier(res)))
            return res
        float(probe(carrier(out)))
        return out

    # Warmup / compile.
    checkpoint("warmup", error="died-in-warmup-compile",
               build_ms_warm=round(build_ms, 2))
    res = run_synced()
    hit_frac = float(jnp.mean(res.hit))

    times = []
    detail = {
        "n_tris": int(n_tris), "n_rays": int(n_rays),
        "hit_frac": round(hit_frac, 4),
        "build_ms_warm": round(build_ms, 2),
        "build_ms_cold": round(build_cold_ms, 2),
        "backend": jax.default_backend(),
        "tile": tile, "engine": engine, "scene": scene_kind,
    }
    for i in range(reps):
        t1 = time.time()
        res = run_synced()
        times.append(time.time() - t1)
        best = min(times)
        mrays = n_rays / best / 1e6
        detail.update(best_s=round(best, 5),
                      times_s=[round(t, 5) for t in times])
        # Checkpoint after EVERY rep: a partial run still reports a real
        # number if the supervisor has to kill us.
        checkpoint(f"rep{i + 1}", value=mrays, detail=detail)
        if _remaining() < 45.0 and i + 1 < reps:
            detail["reps_truncated"] = True
            break

    best = min(times)
    mrays = n_rays / best / 1e6

    # Chained throughput: enqueue `chain` identical queries back-to-back
    # with NO per-call host sync (deferred mode defers the warm path's
    # totals validation), then one value-dependent readback of the LAST
    # result. XLA programs execute serially in enqueue order on the
    # single TPU core, so the last result completing implies all did.
    # This amortizes the tunnel's fixed per-dispatch roundtrip (~10-40 ms)
    # that the reference's device-local GPU dispatch never pays; the
    # deferred finalizers are validated afterwards, so a capacity miss
    # discards the chained number rather than trusting a wrong result.
    # VERDICT r3 weak #5 / task 8: `value` is ALWAYS the per-rep number
    # (one query, one sync — comparable across all rounds). The chained
    # number is emitted as a separate top-level `chain_mrays` field, never
    # max()ed into `value`.
    chain = int(os.environ.get("RAYCORE_BENCH_CHAIN", 4))
    top_extra = {}
    if run_deferred is not None and chain > 1 and _remaining() > 60 \
            and not detail.get("reps_truncated"):
        outs = []
        t2 = time.time()
        for _ in range(chain):
            outs.append(run_deferred())
        float(probe(carrier(outs[-1][0])))
        chain_s = time.time() - t2
        ok = all(f is None or f() is not None for _, f in outs)
        if ok:
            chain_mrays = chain * n_rays / chain_s / 1e6
            detail.update(chain_n=chain, chain_s=round(chain_s, 5))
            top_extra["chain_mrays"] = round(chain_mrays, 4)
            checkpoint("chain", value=mrays, detail=detail, **top_extra)

    print(json.dumps({"detail": detail}), file=sys.stderr, flush=True)
    _write_checkpoint(ckpt, _result_line(mrays, detail=detail, **top_extra))
    return 0


if __name__ == "__main__":
    if "--inner" in sys.argv:
        sys.exit(inner())
    sys.exit(supervise())
