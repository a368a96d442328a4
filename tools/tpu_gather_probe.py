"""Per-lane dynamic row fetch from a VMEM-resident table, inside Pallas —
the microbenchmark that decides the treelet/wide-BVH candidate
(VERDICT r3 "Next round" #2b).

A per-ray wide-BVH traversal needs, per step, one node row per ray at a
data-dependent index (the per-lane gather GPUs do in hardware). On TPU
the options are emulated; this measures each against the budget:

  budget: 90 Mrays/s at ~30 node steps/ray = 2.7 G row-fetches/s
          => 0.37 ns/row. The dense engines' whole-block DMA+matmul
          path moves ~250 rows/us equivalent (~4 ns/row) WITH the
          intersection arithmetic riding along free.

Strategies (table (NN, 128) f32 pinned in VMEM, 512 fetches per step):
  loop    — fori_loop of scalar-indexed VMEM row reads
  onehot  — build (512, NN) one-hot matrix, one bf16 matmul on the MXU
  take    — jnp.take inside the kernel (if Mosaic lowers it)
  xla     — jnp.take at the XLA level (the known ~12 ns/row baseline)

Usage: python tools/tpu_gather_probe.py [NN] [steps]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 512          # fetches per grid step


def _loop_kernel(idx_ref, tbl_ref, out_ref):
    def body(i, acc):
        return acc + tbl_ref[idx_ref[i], :]
    out_ref[0, :] = jax.lax.fori_loop(
        0, R, body, jnp.zeros((128,), jnp.float32))


def _onehot_kernel(idx_ref, tbl_ref, out_ref, *, NN: int):
    b = pl.program_id(0)
    ids = jnp.asarray(idx_ref[pl.ds(b * R, R)]).reshape(R, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, NN), 1)
    onehot = (cols == ids).astype(jnp.bfloat16)
    rows = jnp.dot(onehot, tbl_ref[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    out_ref[0, :] = jnp.sum(rows, axis=0)


def _take_kernel(idx_ref, tbl_ref, out_ref):
    b = pl.program_id(0)
    ids = jnp.asarray(idx_ref[pl.ds(b * R, R)])
    rows = jnp.take(tbl_ref[:], ids, axis=0)
    out_ref[0, :] = jnp.sum(rows, axis=0)


def run_pallas(name, kernel, idx, tbl, steps, idx_smem: bool):
    NN = tbl.shape[0]
    if idx_smem:
        # per-step scalar-prefetch slice of the step's 512 indices
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 128), lambda b, idx: (b, 0)),
        )
        # _loop_kernel reads idx_ref[i] relative to the step: rebase
        def k(idx_ref, tbl_ref, out_ref):
            b = pl.program_id(0)
            def body(i, acc):
                return acc + tbl_ref[idx_ref[b * R + i], :]
            out_ref[0, :] = jax.lax.fori_loop(
                0, R, body, jnp.zeros((128,), jnp.float32))
        fn = pl.pallas_call(
            k, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((steps, 128), jnp.float32))
        args = (idx, tbl)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 128), lambda b, idx: (b, 0)),
        )
        fn = pl.pallas_call(
            partial(kernel, NN=NN) if name == "onehot" else kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((steps, 128), jnp.float32))
        args = (idx, tbl)
    jfn = jax.jit(lambda i, t: fn(i, t))
    out = jfn(*args)
    float(out[0, 0])
    reps = 3
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        out = jfn(*args)
        float(jnp.sum(out[::7]))
        best = min(best, time.time() - t0)
    ns_row = best / (steps * R) * 1e9
    print(f"{name:8s}: {best * 1e3:8.2f} ms total, {ns_row:8.2f} ns/row, "
          f"{1.0 / ns_row:6.2f} Grows/s" if ns_row > 0 else name,
          flush=True)
    return ns_row


def main():
    NN = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (NN, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (steps * R,), 0, NN,
                             jnp.int32)
    print(f"table ({NN},128) f32 = {NN * 512 / 1024:.0f} KB; "
          f"{steps} steps x {R} fetches", flush=True)

    # XLA baseline
    jt = jax.jit(lambda i, t: jnp.sum(jnp.take(t, i, axis=0), axis=0))
    float(jt(idx, tbl)[0])
    t0 = time.time()
    float(jnp.sum(jt(idx, tbl)[::7]))
    dt = time.time() - t0
    print(f"{'xla':8s}: {dt * 1e3:8.2f} ms total, "
          f"{dt / idx.shape[0] * 1e9:8.2f} ns/row", flush=True)

    for name, kernel, smem in (("loop", _loop_kernel, True),
                               ("onehot", _onehot_kernel, False),
                               ("take", _take_kernel, False)):
        try:
            run_pallas(name, kernel, idx, tbl, steps, smem)
        except Exception as e:  # noqa: BLE001 — probe: report and continue
            print(f"{name:8s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    print("\nbudget: 90 Mrays/s x ~30 steps/ray = 0.37 ns/row; the dense "
          "engines' DMA+matmul path ~4 ns/row with intersection math "
          "riding free.", flush=True)


if __name__ == "__main__":
    main()
