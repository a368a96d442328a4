"""Per-block cost decomposition of the worklist sweep kernel.

Runs a grid of identical (TILE, 16) @ (16, 4C) blocks with progressively
richer epilogues and reports us/block for each variant. Isolates what the
measured ~5 us/block (TILE=512) actually buys: matmul passes, the f32
reciprocal, the range compares, the key pack, or VMEM traffic on
materialized (TILE, 4C) intermediates.

Run on the TPU: `python tools/epilogue_experiments.py [TILE] [n_blocks]`.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 128
FEAT = 16


def make_kernel(variant: str, precision):
    def kernel(tids_ref, phi_ref, feats_ref, tmin_ref, key0_ref, key_out):
        phi = phi_ref[:]
        feats = feats_ref[0]
        if variant.startswith("vpu"):
            # Direct VPU broadcast-FMA: only the 19 nonzero coefficients
            # (det: d(3); udet/vdet: d + oxd (6 each); tdet: o + 1 (4)).
            def comb(f_cols, ks):
                acc = phi[:, ks[0]:ks[0] + 1] * f_cols[ks[0]:ks[0] + 1, :]
                for k in ks[1:]:
                    acc += phi[:, k:k + 1] * f_cols[k:k + 1, :]
                return acc
            det = comb(feats[:, 0 * C:1 * C], (0, 1, 2))
            udet = comb(feats[:, 1 * C:2 * C], (0, 1, 2, 3, 4, 5))
            vdet = comb(feats[:, 2 * C:3 * C], (0, 1, 2, 3, 4, 5))
            tdet = comb(feats[:, 3 * C:4 * C], (6, 7, 8, 9))
            if variant == "vpu_only":
                key_out[:] = jnp.min(
                    jax.lax.bitcast_convert_type(det + udet + vdet + tdet,
                                                 jnp.int32),
                    axis=1, keepdims=True)
                return
        else:
            q = jax.lax.dot_general(
                phi, feats, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            det = q[:, 0 * C:1 * C]
            udet = q[:, 1 * C:2 * C]
            vdet = q[:, 2 * C:3 * C]
            tdet = q[:, 3 * C:4 * C]
        tmin = tmin_ref[:]
        cur_key = key0_ref[:]
        mask = jnp.int32(127)
        e = 1e-5

        if variant == "matmul_only":
            key_out[:] = jnp.min(
                jax.lax.bitcast_convert_type(tdet, jnp.int32), axis=1,
                keepdims=True)
            return
        if variant == "no_divide_signtrick":
            # Exact acceptance without any reciprocal: multiply through by
            # |det| (sign applied to the numerators).
            sd = jnp.where(det < 0, -1.0, 1.0)
            ad = det * sd
            us = udet * sd
            vs = vdet * sd
            ts = tdet * sd
            ead = e * ad
            cur_t = jax.lax.bitcast_convert_type(cur_key & ~mask,
                                                 jnp.float32)
            ok = (us >= -ead) & (us <= ad + ead) & (vs >= -ead) \
                & (us + vs <= ad + ead) & (ts >= tmin * ad) \
                & (ts <= cur_t * ad)
            # Approximate t for the ordering key only (acceptance stayed
            # exact); finalize recomputes the winner's exact t.
            t = ts * pl.reciprocal(jnp.maximum(ad, 1e-30), approx=True)
            kb = jax.lax.bitcast_convert_type(jnp.maximum(t, 0.0), jnp.int32)
            ids = jax.lax.broadcasted_iota(jnp.int32, kb.shape, 1)
            key = jnp.where(ok, (kb & ~mask) | ids, jnp.int32(0x7FFFFFFF))
            key_out[:] = jnp.minimum(jnp.min(key, axis=1, keepdims=True),
                                     cur_key)
            return
        if variant == "approx_recip":
            r = pl.reciprocal(det, approx=True)
        else:
            r = 1.0 / det
        u = udet * r
        v = vdet * r
        t = tdet * r
        if variant == "recip_only":
            key_out[:] = jnp.min(
                jax.lax.bitcast_convert_type(u + v + t, jnp.int32),
                axis=1, keepdims=True)
            return
        cur_t = jax.lax.bitcast_convert_type(cur_key & ~mask, jnp.float32)
        ok = (u >= -e) & (u <= 1.0 + e) & (v >= -e) & (u + v <= 1.0 + e) \
            & (t >= tmin) & (t <= cur_t)
        kb = jax.lax.bitcast_convert_type(jnp.maximum(t, 0.0), jnp.int32)
        ids = jax.lax.broadcasted_iota(jnp.int32, kb.shape, 1)
        key = jnp.where(ok, (kb & ~mask) | ids, jnp.int32(0x7FFFFFFF))
        key_min = jnp.min(key, axis=1, keepdims=True)
        key_out[:] = jnp.minimum(key_min, cur_key)
    return kernel


@partial(jax.jit, static_argnames=("TILE", "n_blocks", "variant", "prec",
                                   "same_tile"))
def run(phi, feats, tmin, key0, *, TILE, n_blocks, variant, prec,
        same_tile=False):
    kernel = make_kernel(variant, prec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((TILE, FEAT), lambda b, t_: (t_[b], 0)),
            pl.BlockSpec((1, FEAT, 4 * C), lambda b, t_: (t_[b], 0, 0)),
            pl.BlockSpec((TILE, 1), lambda b, t_: (t_[b], 0)),
            pl.BlockSpec((TILE, 1), lambda b, t_: (t_[b], 0)),
        ],
        out_specs=pl.BlockSpec((TILE, 1), lambda b, t_: (t_[b], 0)),
    )
    tids = (jnp.zeros(n_blocks, jnp.int32) if same_tile
            else jnp.arange(n_blocks, dtype=jnp.int32)
            % (phi.shape[0] // TILE))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((phi.shape[0], 1), jnp.int32),
    )(tids, phi, feats, tmin, key0)


def main(TILE=512, n_blocks=8192):
    rng = np.random.default_rng(0)
    n_tiles = 64
    phi = jnp.asarray(rng.standard_normal((n_tiles * TILE, FEAT),
                                          dtype=np.float32))
    feats = jnp.asarray(rng.standard_normal((n_tiles, FEAT, 4 * C),
                                            dtype=np.float32))
    tmin = jnp.zeros((n_tiles * TILE, 1), jnp.float32)
    key0 = jnp.full((n_tiles * TILE, 1), 0x7FFFFF80, jnp.int32)

    probe = jax.jit(lambda t: t.ravel()[::257].sum())

    def timed(TILE_, v, prec, same_tile, label, nb):
        ph = phi if TILE_ == TILE else jnp.asarray(
            np.random.default_rng(1).standard_normal(
                (64 * TILE_, FEAT), dtype=np.float32))
        tm = jnp.zeros((ph.shape[0], 1), jnp.float32)
        k0 = jnp.full((ph.shape[0], 1), 0x7FFFFF80, jnp.int32)
        fn = lambda: run(ph, feats, tm, k0, TILE=TILE_, n_blocks=nb,
                         variant=v, prec=prec, same_tile=same_tile)
        r = fn(); int(probe(r))
        best = float("inf")
        for _ in range(3):
            t0 = time.time(); r = fn(); int(probe(r))
            best = min(best, time.time() - t0)
        per_block = best / nb * 1e6
        print(f"{label:46s}: {best*1000:7.2f} ms, {per_block:6.2f} us/block, "
              f"{TILE_ * C / per_block * 1e-3:6.1f} Gelem/s")

    H, D = jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT
    for v in ["matmul_only", "vpu_only", "full", "vpu_full"]:
        timed(TILE, v, H, False, f"{v} T={TILE}", n_blocks)
    for T2 in (256, 1024):
        nb2 = n_blocks * TILE // T2
        timed(T2, "vpu_only", H, False, f"vpu_only T={T2}", nb2)
        timed(T2, "vpu_full", H, False, f"vpu_full T={T2}", nb2)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:3]]
    main(*a)
