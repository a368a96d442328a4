"""On-device decomposition of the regroup kernel's per-block cost.

Round-2 measured ~5.5 us per production (512,16)@(16,512) block against
a ~2.3 us HIGHEST matmul floor and ~0.35 us epilogue — leaving ~3 us
unattributed (scalar-prefetch tbl DMAs? feats DMA? grid overhead? the
in-kernel 16-ref concatenate?). This probe times ablation variants of
the SAME kernel on synthetic blocks so the gap can be attributed and
attacked:

  full        the production kernel (16 tbl DMAs + feats DMA + matmul
              + epilogue + 2 outputs)
  contig_tbl  one contiguous (ROWS, FEAT) tbl DMA instead of 16
              scalar-prefetch gathers (upper bound on the DMA-gather
              saving; production can't do this without a 9M-row gather)
  no_matmul   DMAs + epilogue on a cheap elementwise q (isolates the
              matmul's contribution)
  mm_only     DMAs + matmul, epilogue reduced to one column write
  spbX        full kernel at SPB = 8 / 32 (fixed-cost amortization)

Usage (TPU): python tools/probe_block_overhead.py [n_blocks]
Interpret-mode smoke: RAYCORE_PROBE_SMOKE=1 on CPU.
"""
import os
import sys
import time
from functools import partial

if os.environ.get("RAYCORE_PROBE_SMOKE") and os.environ.get(
        "PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    del env["PALLAS_AXON_POOL_IPS"]
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raycore_tpu.ops.pallas_dense import FEAT, _MATMUL_PRECISION, _VMEM_PARAMS
from raycore_tpu.ops.pallas_regroup import COL_TMIN, COL_TMAX, INT32_MAX

_SMOKE = bool(os.environ.get("RAYCORE_PROBE_SMOKE"))
C = 128
K = 64 if _SMOKE else 8192


def _epilogue(q, tbl, C):
    tmin = tbl[:, COL_TMIN:COL_TMIN + 1]
    tmax = tbl[:, COL_TMAX:COL_TMAX + 1]
    det = q[:, 0 * C:1 * C]
    u = q[:, 1 * C:2 * C] / det
    v = q[:, 2 * C:3 * C] / det
    t = q[:, 3 * C:4 * C] / det
    e = 1e-5
    ok = (u >= -e) & (u <= 1 + e) & (v >= -e) & (u + v <= 1 + e) \
        & (t >= tmin) & (t <= tmax)
    kb = jax.lax.bitcast_convert_type(jnp.maximum(t, 0.0), jnp.int32)
    kb = jnp.where(ok, kb, INT32_MAX)
    key_min = jnp.min(kb, axis=1, keepdims=True)
    ids = jax.lax.broadcasted_iota(jnp.int32, kb.shape, 1)
    lane = jnp.min(jnp.where(kb == key_min, ids, jnp.int32(C)),
                   axis=1, keepdims=True)
    return key_min, lane


def make_kernel(variant, G, SPB):
    ROWS = G * SPB

    def kernel(subs_ref, cids_ref, *refs):
        if variant == "contig_tbl":
            tbl_ref, feats_ref, key_out, pair_out = refs
            tbl = tbl_ref[0]
        else:
            tbl_refs = refs[:SPB]
            feats_ref, key_out, pair_out = refs[SPB], refs[SPB + 1], refs[SPB + 2]
            tbl = jnp.concatenate([r[0] for r in tbl_refs], axis=0)
        feats = feats_ref[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, tbl.shape, 1)
        phi_mm = jnp.where(cols >= COL_TMIN, 0.0, tbl)
        if variant == "no_matmul":
            # cheap stand-in with the same output shape
            q = jnp.broadcast_to(phi_mm[:, :1], (ROWS, 4 * C)) \
                + feats[0, :][None, :]
            key_min, lane = _epilogue(q, tbl, C)
        else:
            q = jax.lax.dot_general(
                phi_mm, feats, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_MATMUL_PRECISION)
            if variant == "mm_only":
                key_min = jax.lax.bitcast_convert_type(
                    q[:, :1], jnp.int32)
                lane = jnp.zeros((ROWS, 1), jnp.int32)
            else:
                key_min, lane = _epilogue(q, tbl, C)
        key_out[:] = key_min
        pair_out[:] = lane

    return kernel, ROWS


def run_variant(variant, G, SPB, n_blocks, tbl, feats, subs, cids,
                tbl_contig, interpret):
    kernel, ROWS = make_kernel(variant, G, SPB)

    def tbl_spec(s):
        return pl.BlockSpec((1, G, FEAT),
                            lambda b, subs, cids, s=s: (subs[b * SPB + s],
                                                        0, 0))
    if variant == "contig_tbl":
        in_specs = [pl.BlockSpec((1, ROWS, FEAT),
                                 lambda b, subs, cids: (b, 0, 0))]
        ins = (tbl_contig,)
    else:
        in_specs = [tbl_spec(s) for s in range(SPB)]
        ins = tuple([tbl] * SPB)
    in_specs.append(pl.BlockSpec(
        (1, FEAT, 4 * C), lambda b, subs, cids: (jnp.maximum(cids[b], 0),
                                                 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((ROWS, 1), lambda b, subs, cids: (b, 0))] * 2)

    # feats MUST be an argument, not a closure capture: a captured
    # (K, FEAT, 4C) f32 array (268 MB) is inlined as a jaxpr constant and
    # blows the tunneled backend's remote-compile payload (HTTP 413).
    @jax.jit
    def go(subs, cids, feats, *ins):
        k, p = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((n_blocks * ROWS, 1),
                                            jnp.int32)] * 2,
            compiler_params=_VMEM_PARAMS, interpret=interpret,
        )(subs, cids, *ins, feats)
        return k[::257, 0].sum()

    float(go(subs, cids, feats, *ins))          # compile
    reps = 3
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        float(go(subs, cids, feats, *ins))      # value-dependent readback
        best = min(best, time.time() - t0)
    return best / n_blocks * 1e6


def main():
    smoke = _SMOKE
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else (
        2 if smoke else 8192)
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    G0 = 32
    n_sub = 32768 if not smoke else 64
    tbl = jnp.asarray(rng.normal(size=(n_sub + 1, G0, FEAT)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(K, FEAT, 4 * C)).astype(np.float32))

    for variant, G, SPB in (("full", 32, 16), ("contig_tbl", 32, 16),
                            ("mm_only", 32, 16), ("no_matmul", 32, 16),
                            ("full", 32, 8), ("full", 32, 32)):
        ROWS = G * SPB
        subs = jnp.asarray(rng.integers(0, n_sub, n_blocks * SPB,
                                        dtype=np.int32))
        cids = jnp.asarray((np.arange(n_blocks) % K).astype(np.int32))
        tblc = jnp.asarray(rng.normal(
            size=(n_blocks, ROWS, FEAT)).astype(np.float32)) \
            if variant == "contig_tbl" else None
        us = run_variant(variant, G, SPB, n_blocks, tbl, feats, subs,
                         cids, tblc, interpret)
        print(f"{variant:11s} G={G} SPB={SPB:2d}: {us:7.2f} us/block "
              f"({us / SPB:.3f} us/pair)", flush=True)


if __name__ == "__main__":
    main()
