"""On-device probe: Pallas matmul cost vs (M, K, N, precision).

The regroup sweep's per-block cost (~5.5 us) is dominated by the
(512,16)@(16,512) fp32 HIGHEST matmul (~4 us), far above its flop time.
This probe times the candidate shapes for round-3 kernel designs:
  - M scaling (SPB growth): does per-step fixed cost amortize with M?
  - K=128 block-diagonal packing: is a full-depth matmul cheaper per
    useful flop than K=16?
  - precision tiers: DEFAULT (1 bf16 pass), HIGH, HIGHEST (6 passes).

Each config runs a grid of STEPS identical matmuls over resident VMEM
blocks (same operands — isolates compute from HBM), so the per-step cost
is directly comparable to the production kernel's per-block cost.

Run on the TPU: python tools/probe_matmul_shapes.py
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

def make_fn(M, K, N, prec, dtype, steps):
    def kernel(a_ref, b_ref, out_ref):
        q = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        out_ref[:] = jnp.sum(q, axis=1, keepdims=True)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[pl.BlockSpec((M, K), lambda i: (0, 0)),
                      pl.BlockSpec((K, N), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((M, 1), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
        )(a.astype(dtype), b.astype(dtype))
    return run


def _best_wall(run, a, b, reps=5):
    out = run(a, b)
    float(out.sum())                      # honest completion
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(a, b)
        float(out.sum())
        best = min(best, time.perf_counter() - t0)
    return best


def probe(M, K, N, prec_name, dtype=jnp.float32):
    """Per-step cost as the SLOPE between two grid sizes: the tunneled
    backend's ~30 ms dispatch floor poisons absolute wall/steps."""
    prec = dict(default=jax.lax.Precision.DEFAULT,
                high=jax.lax.Precision.HIGH,
                highest=jax.lax.Precision.HIGHEST)[prec_name]
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    n1, n2 = 8192, 32768
    t1 = _best_wall(make_fn(M, K, N, prec, dtype, n1), a, b)
    t2 = _best_wall(make_fn(M, K, N, prec, dtype, n2), a, b)
    us = (t2 - t1) / (n2 - n1) * 1e6
    eq512 = us * (512 / M)                # per 512-row-block equivalent
    print(f"({M:5d},{K:3d})@({K:3d},{N:4d}) {str(dtype.__name__):8s} "
          f"{prec_name:7s}: {us:7.2f} us/step  ({eq512:6.2f} us per "
          f"512-row equiv)")
    return us


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    # Baseline production shape.
    probe(512, 16, 512, "highest")
    probe(512, 16, 512, "default")
    probe(512, 16, 512, "default", jnp.bfloat16)
    # M scaling at K=16 (bigger SPB -> fewer steps).
    probe(1024, 16, 512, "highest")
    probe(2048, 16, 512, "highest")
    probe(2048, 16, 512, "default")
    # Full-depth K=128 (block-diagonal packing of 8 sub-blocks).
    probe(512, 128, 512, "highest")
    probe(512, 128, 512, "default")
    probe(512, 128, 512, "default", jnp.bfloat16)
    # Narrower N (C=64 / C=32 clusters).
    probe(512, 16, 256, "highest")
    probe(512, 16, 128, "highest")
    probe(2048, 16, 128, "highest")
