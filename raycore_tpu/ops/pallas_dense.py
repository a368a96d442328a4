"""Pallas worklist kernel for the dense clustered engine.

The XLA dense engine (accel/dense.py) pays for S clusters per tile per
round even when a tile needs one. This kernel removes that waste with a
compacted worklist: qualifying (ray-tile, cluster) pairs are enumerated
once, sorted by tile, and the Pallas grid walks them with
PrefetchScalarGridSpec — each grid step DMAs exactly the phi tile and the
cluster feature block it needs (index_map reads the prefetched id arrays),
computes the (TILE, 16) @ (16, 4C) fp32 matmul on the MXU, runs the
Möller–Trumbore epilogue on the VPU, and min-merges into per-ray best
buffers. Consecutive blocks of the same tile keep the output block
resident in VMEM (Pallas revisiting), so the merge is register-speed.

The kernel carries TWO per-ray best buffers: a packed int32 key (the best
t's float bits with the winning lane index in the low mantissa bits — one
cross-lane int-min replaces the min/argmin/u-select/v-select reduction
quartet) and the packed prim index; exact (u, v, t) for the single winning
triangle are recomputed in finalize_hits_exact. Long worklists chain
bounded pallas_calls with `input_output_aliases` so carried bests survive
chunk boundaries (scalar-prefetch id arrays live in SMEM and must stay
small).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.triangle import safe_invdir
from ..core.triangle import INV_DIR_CLAMP as _INV_DIR_CLAMP

FEAT = 16
# Mosaic's default scoped-VMEM budget is 16 MB; the TILE=512 / C=128
# worklist kernel's unrolled sub-chunk epilogue needs ~21 MB of scratch
# (observed OOM at the 100K-tri/262K-ray config). v5e has 128 MB VMEM and
# our block specs are tiny, so raise the scratch budget for all kernels.
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
# fp32 accuracy on the MXU costs 6 bf16 passes (HIGHEST — the default;
# winner selection is fp32-exact). RAYCORE_MM_PRECISION relaxes the
# winner-SELECTION matmuls only (payloads are recomputed exactly in
# finalize_hits_exact): "high"/"bf16x3" = manual 3-pass hi/lo split
# (see _mm_sweep), "default" = 1-pass bf16 (timing experiments only —
# it breaks edge-eps exactness). "high" aliases the manual split
# because the Mosaic TPU lowering raises NotImplementedError on
# Precision.HIGH inside Pallas kernels (measured on-device, r4f log).
import os as _os
_MM_MODE = _os.environ.get("RAYCORE_MM_PRECISION", "")
if _MM_MODE == "high":
    _MM_MODE = "bf16x3"
_MATMUL_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,   # 1-pass bf16 (experiment only:
                                            # breaks edge-eps exactness)
}.get(_MM_MODE,
      jax.lax.Precision.HIGHEST)            # 6-pass, fp32-exact (default)


def _mm_sweep(a, b):
    """The sweep's featurized-MT matmul at the configured precision.

    "bf16x3" is a MANUAL 3-pass split (hi/lo bf16 decomposition, drops
    the lo*lo term — ~2^-14 relative error on the winner-selection
    quantities, same contract as Precision.HIGH) for the case where the
    Mosaic lowering treats HIGH as HIGHEST: the splits are cheap VPU
    elementwise ops and each dot issues at DEFAULT (1 MXU pass)."""
    if _MM_MODE == "bf16x3":
        a_hi = a.astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        return dot(a_hi, b_hi) + (dot(a_hi, b_lo) + dot(a_lo, b_hi))
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_MATMUL_PRECISION)

# --- packed best keys -------------------------------------------------------
# The kernel carries ONE int32 per ray: the bit pattern of the best t (a
# positive float, so int ordering == float ordering) with the low mantissa
# bits replaced by the winning lane index. This turns the epilogue's four
# cross-lane reductions (min, argmin, u-select, v-select) into a single int
# min — the VPU epilogue was ~3.8 us of the measured ~5 us per block vs a
# ~1.2 us matmul floor (tools/profile_stages.py). Exact (u, v, t) for the
# one winning triangle are recomputed in finalize_hits_exact, so payload
# precision is FULL scalar Möller–Trumbore (better than the old carried
# featurized values); only the *ordering* of hits within 2^-(23-bits)
# relative t of each other is affected by the mantissa truncation.


def _idx_bits(CS: int) -> int:
    """Mantissa bits reserved for the lane index (7 for 128-tri chunks)."""
    return max((CS - 1).bit_length(), 1)


def _pack_tmax(t_max, bits: int):
    """Initial best keys from per-ray t_max: truncated float bits with the
    index field saturated, so any candidate with smaller truncated t wins.
    Negative t_max (padding rows use -inf) clamps to 0 => nothing wins."""
    mask = (1 << bits) - 1
    tp = jnp.maximum(t_max.astype(jnp.float32), 0.0)
    k = jax.lax.bitcast_convert_type(tp, jnp.int32)
    return (k & ~mask) | mask


def _t_from_keys(key, bits: int):
    """Decode the truncated best t (<= true t; inf bit pattern survives)."""
    mask = (1 << bits) - 1
    return jax.lax.bitcast_convert_type(key & ~mask, jnp.float32)


def _kernel(tids_ref, cids_ref, phi_ref, feats_ref, sub_ref, tmin_ref,
            key0_ref, pair0_ref, key_out, pair_out, *, C: int, SUB: int,
            edge_eps: float, n_dummy_tile: int):
    b = pl.program_id(0)
    tid = tids_ref[b]
    prev_tid = tids_ref[jnp.maximum(b - 1, 0)]
    first = (b == 0) | (tid != prev_tid)
    cid = cids_ref[b]
    # Padding blocks all point at the dummy tile; skip their compute (the
    # repeated dummy index also means Pallas never re-DMAs their blocks).
    valid = tid != n_dummy_tile

    @pl.when(valid)
    def _():
        _kernel_body(cids_ref, phi_ref, feats_ref, sub_ref, tmin_ref,
                     key0_ref, pair0_ref, key_out, pair_out, b, cid, first,
                     C=C, SUB=SUB, edge_eps=edge_eps)


def _kernel_body(cids_ref, phi_ref, feats_ref, sub_ref, tmin_ref, key0_ref,
                 pair0_ref, key_out, pair_out, b, cid, first, *, C: int,
                 SUB: int, edge_eps: float):
    phi = phi_ref[:]                     # (TILE, 16)
    feats = feats_ref[0]                 # (16, 4C) sub-chunk-major
    CS = C // SUB
    bits = _idx_bits(CS)
    mask = jnp.int32((1 << bits) - 1)

    cur_key = jnp.where(first, key0_ref[:], key_out[:])       # (TILE, 1)
    cur_pair = jnp.where(first, pair0_ref[:], pair_out[:])
    tmin = tmin_ref[:]

    o = phi[:, 6:9]
    invd = phi[:, 10:13]
    e = edge_eps

    for s in range(SUB):
        # Per-ray slab test against this sub-chunk's AABB; skip the whole
        # matmul + epilogue when no ray in the tile can enter it.
        cur_t = jax.lax.bitcast_convert_type(cur_key & ~mask, jnp.float32)
        lo = tmin
        hi = cur_t
        CL = jnp.float32(_INV_DIR_CLAMP)   # exact safe_invdir clamp
        for a in range(3):
            bmin_a = sub_ref[0, 0, s * 6 + a]
            bmax_a = sub_ref[0, 0, s * 6 + 3 + a]
            t0 = (bmin_a - o[:, a:a + 1]) * invd[:, a:a + 1]
            t1 = (bmax_a - o[:, a:a + 1]) * invd[:, a:a + 1]
            alo = jnp.minimum(t0, t1)
            ahi = jnp.maximum(t0, t1)
            # Axis-parallel correction (see core.bounds.fast_intersect_
            # bbox): clamped invdir reports a false exit for rays whose
            # origin sits inside the slab -> widen to all-t. Outside
            # origins keep the finite clamped interval (a conservative
            # entry underestimate) rather than forcing empty.
            par = jnp.abs(invd[:, a:a + 1]) >= CL
            inside = (o[:, a:a + 1] >= bmin_a) & (o[:, a:a + 1] <= bmax_a)
            alo = jnp.where(par & inside, -jnp.inf, alo)
            ahi = jnp.where(par & inside, jnp.inf, ahi)
            lo = jnp.maximum(lo, alo)
            hi = jnp.minimum(hi, ahi)
        sub_live = jnp.any(lo <= hi)

        def test_sub(cur, s=s):
            cur_key, cur_pair = cur
            cur_t = jax.lax.bitcast_convert_type(cur_key & ~mask,
                                                 jnp.float32)
            q = _mm_sweep(
                phi, feats[:, s * 4 * CS:(s + 1) * 4 * CS])  # (TILE, 4CS)
            det = q[:, 0 * CS:1 * CS]
            udet = q[:, 1 * CS:2 * CS]
            vdet = q[:, 2 * CS:3 * CS]
            tdet = q[:, 3 * CS:4 * CS]
            r = 1.0 / det
            u = udet * r
            v = vdet * r
            t = tdet * r
            ok = (u >= -e) & (u <= 1.0 + e) & (v >= -e) \
                & (u + v <= 1.0 + e) & (t >= tmin) & (t <= cur_t)
            # Single cross-lane reduction: int bits of t (positive, so int
            # order == float order) with the lane id in the low mantissa.
            kb = jax.lax.bitcast_convert_type(jnp.maximum(t, 0.0),
                                              jnp.int32)
            ids = jax.lax.broadcasted_iota(jnp.int32, kb.shape, 1)
            key = jnp.where(ok, (kb & ~mask) | ids,
                            jnp.int32(0x7FFFFFFF))
            key_min = jnp.min(key, axis=1, keepdims=True)
            better = key_min < cur_key
            pair = cid * C + s * CS + (key_min & mask)
            return (jnp.where(better, key_min, cur_key),
                    jnp.where(better, pair, cur_pair))

        if SUB == 1:
            # Single chunk: the cluster-level interval test already
            # qualified this block — skip the cond/slab machinery.
            cur_key, cur_pair = test_sub((cur_key, cur_pair))
        else:
            cur_key, cur_pair = jax.lax.cond(
                sub_live, test_sub, lambda cur: cur, (cur_key, cur_pair))

    key_out[:] = cur_key
    pair_out[:] = cur_pair


WORKLIST_CHUNK = 4096   # blocks per pallas_call: scalar-prefetch ids live
                        # in SMEM, so the id arrays must stay small.


@partial(jax.jit, static_argnames=("TILE", "C", "SUB", "n_blocks",
                                   "interpret"))
def _run_worklist(tids, cids, phi, feats, sub_bounds, tmin, key0, *,
                  TILE: int, C: int, SUB: int, n_blocks: int,
                  interpret: bool, pair0=None):
    """tids/cids: (n_blocks,) int32 sorted by tid (padding blocks point at
    the trailing dummy tile). phi: (n_tiles_p*TILE, 16). feats: (K, 16, 4C).
    tmin/key0: (n_tiles_p*TILE, 1); key0 from `_pack_tmax` (or a previous
    pass's keys). Returns (key, pair) flat rows — decode t with
    `_t_from_keys`; exact (u, v, t) come from finalize_hits_exact.

    Long worklists run as a chain of bounded pallas_calls; each chunk's
    outputs seed the next chunk's init buffers, so tiles split across
    chunk boundaries merge correctly."""
    R = phi.shape[0]
    n_dummy_tile = R // TILE - 1
    kernel = partial(_kernel, C=C, SUB=SUB, edge_eps=1e-5,
                     n_dummy_tile=n_dummy_tile)
    out_shapes = [
        jax.ShapeDtypeStruct((R, 1), jnp.int32),
        jax.ShapeDtypeStruct((R, 1), jnp.int32),
    ]
    spec_tile = pl.BlockSpec((TILE, 1), lambda b, t, c: (t[b], 0))

    key = key0
    pair = jnp.full((R, 1), -1, jnp.int32) if pair0 is None else pair0
    n_chunks = -(-n_blocks // WORKLIST_CHUNK)
    for ch in range(n_chunks):
        lo = ch * WORKLIST_CHUNK
        sz = min(WORKLIST_CHUNK, n_blocks - lo)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(sz,),
            in_specs=[
                pl.BlockSpec((TILE, FEAT), lambda b, t_, c: (t_[b], 0)),
                pl.BlockSpec((1, FEAT, 4 * C), lambda b, t_, c: (c[b], 0, 0)),
                pl.BlockSpec((1, 1, 128), lambda b, t_, c: (c[b], 0, 0)),
                spec_tile, spec_tile, spec_tile,
            ],
            out_specs=[spec_tile] * 2,
        )
        # Alias the carried best buffers onto the outputs so rows whose
        # tile is absent from this chunk keep their previous values.
        key, pair = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shapes,
            input_output_aliases={6: 0, 7: 1},
            compiler_params=_VMEM_PARAMS,
            interpret=interpret,
        )(tids[lo:lo + sz], cids[lo:lo + sz], phi, feats, sub_bounds,
          tmin, key, pair)
    return key[:, 0], pair[:, 0]


# --- occlusion (any_hit) kernel ---------------------------------------------
# Reference any_hit early-exits on the first accepted hit and only the
# boolean + occluder identity are contractual (src/instanced-bvh.jl:
# 2034-2140). The dedicated kernel carries ONE int32 per ray (occluder
# prim, -1 = free), tests t against the ray's ORIGINAL t_max (no best-t
# shrinking), and skips a block's matmul entirely once every ray in the
# tile is occluded — the TPU analogue of the per-thread early return.


def _occl_kernel(tids_ref, cids_ref, phi_ref, feats_ref, tmin_ref,
                 tmax_ref, pair0_ref, pair_out, *, C: int,
                 edge_eps: float, n_dummy_tile: int):
    b = pl.program_id(0)
    tid = tids_ref[b]
    prev_tid = tids_ref[jnp.maximum(b - 1, 0)]
    first = (b == 0) | (tid != prev_tid)
    cid = cids_ref[b]
    valid = tid != n_dummy_tile

    @pl.when(valid)
    def _():
        cur = jnp.where(first, pair0_ref[:], pair_out[:])    # (TILE, 1)

        def test(cur):
            phi = phi_ref[:]
            feats = feats_ref[0]
            q = _mm_sweep(phi, feats)                 # (TILE, 4C)
            det = q[:, 0 * C:1 * C]
            udet = q[:, 1 * C:2 * C]
            vdet = q[:, 2 * C:3 * C]
            tdet = q[:, 3 * C:4 * C]
            r = 1.0 / det
            u = udet * r
            v = vdet * r
            t = tdet * r
            e = edge_eps
            ok = (u >= -e) & (u <= 1.0 + e) & (v >= -e) \
                & (u + v <= 1.0 + e) & (t >= tmin_ref[:]) \
                & (t <= tmax_ref[:])
            ids = jax.lax.broadcasted_iota(jnp.int32, ok.shape, 1)
            lane = jnp.min(jnp.where(ok, ids, jnp.int32(C)), axis=1,
                           keepdims=True)
            found = lane < C
            return jnp.where((cur < 0) & found, cid * C + lane, cur)

        # Early exit: skip the matmul once the whole tile is occluded.
        cur = jax.lax.cond(jnp.any(cur < 0), test, lambda c: c, cur)
        pair_out[:] = cur


@partial(jax.jit, static_argnames=("TILE", "C", "n_blocks", "interpret"))
def _run_occlusion(tids, cids, phi, feats, tmin, tmax, *, TILE: int,
                   C: int, n_blocks: int, interpret: bool):
    """Occlusion sweep over a tile-sorted worklist. Returns (R,) occluder
    prim per ray (-1 = unoccluded). Same chunking contract as
    _run_worklist."""
    R = phi.shape[0]
    n_dummy_tile = R // TILE - 1
    kernel = partial(_occl_kernel, C=C, edge_eps=1e-5,
                     n_dummy_tile=n_dummy_tile)
    spec_tile = pl.BlockSpec((TILE, 1), lambda b, t, c: (t[b], 0))
    pair = jnp.full((R, 1), -1, jnp.int32)
    n_chunks = -(-n_blocks // WORKLIST_CHUNK)
    for ch in range(n_chunks):
        lo = ch * WORKLIST_CHUNK
        sz = min(WORKLIST_CHUNK, n_blocks - lo)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(sz,),
            in_specs=[
                pl.BlockSpec((TILE, FEAT), lambda b, t_, c: (t_[b], 0)),
                pl.BlockSpec((1, FEAT, 4 * C),
                             lambda b, t_, c: (c[b], 0, 0)),
                spec_tile, spec_tile, spec_tile,
            ],
            out_specs=[spec_tile],
        )
        pair, = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((R, 1), jnp.int32)],
            input_output_aliases={6: 0},
            compiler_params=_VMEM_PARAMS,
            interpret=interpret,
        )(tids[lo:lo + sz], cids[lo:lo + sz], phi, feats, tmin, tmax, pair)
    return pair[:, 0]


@partial(jax.jit, static_argnames=("TILE", "max_pairs", "interpret"))
def _occl_phase_a(scene, o, d, t_min, t_max, *, TILE: int, max_pairs: int,
                  interpret: bool):
    from ..accel.dense import ray_features
    R0 = o.shape[0]
    d = jnp.where(d == 0.0, 0.0, d)
    pad0 = (-R0) % TILE
    if pad0:
        ext = lambda a, f: jnp.concatenate(
            [a, jnp.full((pad0,) + a.shape[1:], f, a.dtype)])
        o, d = ext(o, 0.0), ext(d, 1.0)
        t_min, t_max = ext(t_min, 0.0), ext(t_max, -jnp.inf)
    R = o.shape[0]
    n_tiles = R // TILE
    entry = phase_a_entry(scene, o, d, t_min, t_max, n_tiles, TILE,
                          interpret)
    tids, cids, total = build_worklist(entry, max_pairs)
    phi_p = jnp.concatenate([ray_features(o, d),
                             jnp.zeros((TILE, FEAT), jnp.float32)])
    tmin_p = jnp.concatenate([t_min, jnp.zeros((TILE,))])[:, None]
    tmax_p = jnp.concatenate([t_max, jnp.full((TILE,), -jnp.inf)])[:, None]
    return tids, cids, total, phi_p, tmin_p, tmax_p


@partial(jax.jit, static_argnames=("TILE", "n_blocks", "R0", "interpret"))
def _occl_finalize(scene, tids, cids, phi_p, tmin_p, tmax_p, *, TILE: int,
                   n_blocks: int, R0: int, interpret: bool):
    from ..accel.dense import _hit_instance_idx
    from ..accel.brute import HitResult
    from ..core.triangle import Triangle
    C = scene.cluster_size
    pair = _run_occlusion(tids[:n_blocks], cids[:n_blocks], phi_p,
                          scene.tri_feats, tmin_p, tmax_p, TILE=TILE,
                          C=C, n_blocks=n_blocks, interpret=interpret)
    pair = pair[:R0]
    hit = pair >= 0
    R = pair.shape[0]
    # Translate the table-space winner to its original index (one tiny
    # R-row gather of the hot original-index column).
    ids = jnp.take(scene.prims_hot[:, 10], jnp.clip(pair, 0, None))
    orig = jnp.where(hit, ids, -1)
    z3 = jnp.zeros((R, 3, 3), jnp.float32)
    tri = Triangle(vertices=z3, normals=z3, tangents=z3,
                   uv=jnp.zeros((R, 3, 2), jnp.float32),
                   metadata=jnp.zeros((R,), jnp.uint32))
    return HitResult(hit=hit, triangle=tri,
                     t=jnp.zeros((R,), jnp.float32),
                     barycentric=jnp.zeros((R, 3), jnp.float32),
                     prim_idx=orig,
                     instance_idx=_hit_instance_idx(scene, orig, hit))


def any_hit_dense_pallas_auto(scene, rays, *, tile: int = 512):
    """Occlusion query via the dedicated any_hit kernel: first accepted
    candidate wins, no best-t carry, no duplicate merge, no payload
    gather — the boolean, occluder prim and instance are contractual
    (t/bary/triangle are zeros; reference any_hit early-exit semantics,
    src/instanced-bvh.jl:2034-2140). Forces t_min = 0 like the
    reference. Auto-sizes the worklist with one host sync, same contract
    as closest_hit_dense_pallas_auto."""
    interpret = jax.default_backend() != "tpu"
    batch = rays.batch_shape
    flat = lambda a: a.reshape((-1,) + a.shape[len(batch):])
    o = flat(rays.o)
    R = o.shape[0]
    TILE = min(tile, max(R, 8))
    n_tiles = -(-R // TILE)
    hard = n_tiles * scene.n_clusters
    t_min0 = jnp.zeros_like(flat(rays.t_min))
    tids, cids, total, phi_p, tmin_p, tmax_p = _occl_phase_a(
        scene, o, flat(rays.d), t_min0, flat(rays.t_max), TILE=TILE,
        max_pairs=hard, interpret=interpret)
    nb = int(total)                         # the one host sync
    nb = 1 << max(9, (max(nb, 1) - 1).bit_length())
    nb = min(nb, hard)
    res = _occl_finalize(scene, tids, cids, phi_p, tmin_p, tmax_p,
                         TILE=TILE, n_blocks=nb, R0=R, interpret=interpret)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(batch + a.shape[1:]), res)


def _phase_a_kernel(stats_ref, bounds_ref, entry_out):
    """Interval bundle-vs-AABB test, fused in VMEM.

    stats cols: o_lo(0:3) o_hi(3:6) i_lo(6:9) i_hi(9:12) tmin(12) tmax(13).
    bounds rows: bmin xyz (0:3), bmax xyz (3:6). One output element per
    (tile, cluster): conservative entry lower bound or +inf.
    """
    stats = stats_ref[:]                      # (TN, 16)
    TN = stats.shape[0]
    K = bounds_ref.shape[1]
    t_lo = jnp.full((TN, K), -jnp.inf, jnp.float32)
    t_hi = jnp.full((TN, K), jnp.inf, jnp.float32)
    CL = jnp.float32(_INV_DIR_CLAMP)   # exact safe_invdir clamp
    for a in range(3):
        blo = bounds_ref[a, :][None, :]
        bhi = bounds_ref[3 + a, :][None, :]
        lo8 = jnp.full((TN, K), jnp.inf, jnp.float32)
        hi8 = jnp.full((TN, K), -jnp.inf, jnp.float32)
        for bb in (blo, bhi):
            for oc in (stats[:, a:a + 1], stats[:, 3 + a:4 + a]):
                diff = bb - oc
                for ic in (stats[:, 6 + a:7 + a], stats[:, 9 + a:10 + a]):
                    prod = diff * ic
                    lo8 = jnp.minimum(lo8, prod)
                    hi8 = jnp.maximum(hi8, prod)
        # Clamped-invdir slab tests falsely evict near-parallel rays whose
        # origin sits inside the slab within ~t*1e-5 of a face (see
        # dense._phase_a_tile_entry); widen the axis for such bundles.
        par = (stats[:, 9 + a:10 + a] >= CL) | (stats[:, 6 + a:7 + a] <= -CL)
        ovl = (stats[:, 3 + a:4 + a] >= blo) & (stats[:, a:a + 1] <= bhi)
        wide = par & ovl
        t_lo = jnp.maximum(t_lo, jnp.where(wide, -jnp.inf, lo8))
        t_hi = jnp.minimum(t_hi, jnp.where(wide, jnp.inf, hi8))
    entry = jnp.maximum(t_lo, stats[:, 12:13])
    exit_ = jnp.minimum(t_hi, stats[:, 13:14])
    entry_out[:] = jnp.where(entry <= exit_, entry, jnp.inf)


@partial(jax.jit, static_argnames=("interpret",))
def _phase_a_fast(stats, bounds, *, interpret: bool):
    """(n_tiles, 16) stats x (6, K) bounds -> (n_tiles, K) entry matrix."""
    n_tiles = stats.shape[0]
    K = bounds.shape[1]
    TN = min(128, n_tiles)
    KB = min(1024, K)
    grid = (-(-n_tiles // TN), -(-K // KB))
    return pl.pallas_call(
        _phase_a_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, 16), lambda i, j: (i, 0)),
            pl.BlockSpec((6, KB), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((TN, KB), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, K), jnp.float32),
        interpret=interpret,
    )(stats, bounds)


def phase_a_entry(scene, o, d, t_min, t_max, n_tiles, TILE, interpret):
    """Tile stats + Pallas interval culling -> (n_tiles, K) entry bounds."""
    return phase_a_entry_bounds(scene.cluster_min, scene.cluster_max,
                                o, d, t_min, t_max, n_tiles, TILE,
                                interpret)


def phase_a_entry_bounds(bounds_min, bounds_max, o, d, t_min, t_max,
                         n_tiles, TILE, interpret):
    """phase_a_entry against arbitrary (K, 3) AABBs — the instanced
    engine culls against per-instance world AABBs with the same kernel."""
    invd = safe_invdir(jnp.where(d == 0.0, 0.0, d))
    shp = lambda a: a.reshape((n_tiles, TILE) + a.shape[1:])
    o_t, invd_t = shp(o), shp(invd)
    stats = jnp.concatenate([
        jnp.min(o_t, axis=1), jnp.max(o_t, axis=1),
        jnp.min(invd_t, axis=1), jnp.max(invd_t, axis=1),
        jnp.min(shp(t_min), axis=1)[:, None],
        jnp.max(shp(t_max), axis=1)[:, None],
        jnp.zeros((n_tiles, 2), jnp.float32)], axis=1)
    bounds = jnp.concatenate([bounds_min.T, bounds_max.T])
    # Pad K to the lane block so the kernel grid divides evenly.
    K = bounds.shape[1]
    KB = min(1024, K)
    padK = (-K) % KB
    if padK:
        bounds = jnp.concatenate(
            [bounds, jnp.full((6, padK), 1e30, jnp.float32)], axis=1)
    TN = min(128, n_tiles)
    padT = (-n_tiles) % TN
    if padT:
        stats = jnp.concatenate(
            [stats, jnp.zeros((padT, 16), jnp.float32)])
    entry = _phase_a_fast(stats, bounds, interpret=interpret)
    return entry[:n_tiles, :K]


def compact_indices(flat, cap: int):
    """Indices of the first ``cap`` True flags, in order, plus the true
    count. Entries past the count are 0 (callers mask on ``arange < total``).

    Two lowerings, RAYCORE_WORKLIST={argsort (default) | scatter}:
    cumsum positions + one ordered scatter is O(N) bandwidth, vs the
    stable argsort's full N-element sort (~25 ms at 16.8M elements,
    docs/performance.md) — but XLA:TPU scatters can themselves lower to
    sorts, so the default stays argsort until the scatter path is
    measured faster on device (tools/run_evidence_r2e.sh)."""
    N = flat.shape[0]
    total = jnp.sum(flat.astype(jnp.int32))
    if _os.environ.get("RAYCORE_WORKLIST", "argsort") == "argsort":
        order = jnp.argsort(~flat, stable=True)
        return order[:cap], total
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1     # in-order positions
    idx = jnp.where(flat, pos, cap)                  # invalid -> dropped
    sel = jnp.zeros((cap,), jnp.int32).at[idx].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    return sel, total


def build_worklist(entry, max_pairs: int):
    """From the (n_tiles, K) conservative entry matrix, emit (tids, cids)
    for every finite-entry pair, sorted by tile (finite pairs first).
    Invalid/overflow rows get ``tid = n_tiles`` (a dummy tile the caller
    pads phi/outputs with) so their writes are harmless. Returns
    (tids, cids, total) — the caller must check total <= max_pairs."""
    n_tiles, K = entry.shape
    finite = jnp.isfinite(entry)
    flat = finite.reshape(-1)
    sel, total = compact_indices(flat, max_pairs)
    valid = jnp.arange(max_pairs) < total
    tids = jnp.where(valid, (sel // K).astype(jnp.int32), n_tiles)
    cids = jnp.where(valid, (sel % K).astype(jnp.int32), 0)
    return tids, cids, total


@partial(jax.jit, static_argnames=("TILE", "max_pairs", "interpret"))
def _pallas_query(scene, o, d, t_min, t_max,
                  *, TILE: int, max_pairs: int, interpret: bool):
    """End-to-end jitted query: pad -> interval phase A -> worklist ->
    Pallas sweep -> finalize. One dispatch (eager glue on the tunneled
    backend costs ~ms per op)."""
    from ..accel.dense import ray_features, finalize_hits_exact
    C = scene.cluster_size
    R0 = o.shape[0]
    d = jnp.where(d == 0.0, 0.0, d)
    pad0 = (-R0) % TILE
    if pad0:
        ext = lambda a, f: jnp.concatenate(
            [a, jnp.full((pad0,) + a.shape[1:], f, a.dtype)])
        o, d = ext(o, 0.0), ext(d, 1.0)
        t_min, t_max = ext(t_min, 0.0), ext(t_max, -jnp.inf)
    R = o.shape[0]
    n_tiles = R // TILE
    entry = phase_a_entry(scene, o, d, t_min, t_max, n_tiles, TILE,
                          interpret)
    tids, cids, total = build_worklist(entry, max_pairs)

    phi = ray_features(o, d)
    # Dummy tile row block absorbs invalid worklist entries.
    phi_p = jnp.concatenate([phi, jnp.zeros((TILE, FEAT), jnp.float32)])
    tmin_p = jnp.concatenate([t_min, jnp.zeros((TILE,))])[:, None]
    bits = _idx_bits(C // scene.sub_chunks)
    key0_p = _pack_tmax(jnp.concatenate(
        [t_max, jnp.full((TILE,), -jnp.inf)])[:, None], bits)

    key, pair = _run_worklist(tids, cids, phi_p, scene.tri_feats,
                              scene.sub_bounds, tmin_p, key0_p,
                              TILE=TILE, C=C, SUB=scene.sub_chunks,
                              n_blocks=max_pairs, interpret=interpret)
    t = _t_from_keys(key, bits)
    # Rows whose tile never appears in the worklist keep undefined
    # outputs; mask them via the entry matrix.
    tile_touched = jnp.any(jnp.isfinite(entry), axis=1)      # (n_tiles,)
    touched = jnp.repeat(tile_touched, TILE)
    touched = jnp.concatenate([touched, jnp.zeros((TILE,), bool)])
    t = jnp.where(touched, t, jnp.inf)
    pair = jnp.where(touched, pair, -1)
    res = finalize_hits_exact(scene, pair[:R0], t[:R0], o[:R0], d[:R0])
    return res, total


def _toppass_worklist(entry, S1: int):
    """Per-tile nearest-S1 selection, emitted tile-major (already sorted).
    Returns (tids, cids, remaining_entry)."""
    n_tiles, K = entry.shape
    e = entry
    cids = []
    rows = jnp.arange(n_tiles)
    for _ in range(S1):
        cid = jnp.argmin(e, axis=1)
        cids.append(cid)
        e = e.at[rows, cid].set(jnp.inf)
    cids = jnp.stack(cids, axis=1)                     # (n_tiles, S1)
    sel_entry = jnp.take_along_axis(entry, cids, axis=1)
    valid = jnp.isfinite(sel_entry)
    tids = jnp.where(valid, rows[:, None], n_tiles).reshape(-1)
    cids = jnp.where(valid, cids, 0).reshape(-1)
    # Tile-major but invalids interleaved; sort by tid to group dummies last.
    order = jnp.argsort(tids, stable=True)
    return tids[order].astype(jnp.int32), cids[order].astype(jnp.int32), e


@partial(jax.jit, static_argnames=("TILE", "max_pairs", "S1", "interpret"))
def _pallas_query2(scene, o, d, t_min, t_max,
                   *, TILE: int, max_pairs: int, S1: int, interpret: bool):
    """Two-pass pruned query: nearest-S1 clusters per tile first, then only
    the candidates whose conservative entry can still beat some ray's best."""
    from ..accel.dense import ray_features, finalize_hits_exact
    C = scene.cluster_size
    R0 = o.shape[0]
    d = jnp.where(d == 0.0, 0.0, d)
    pad0 = (-R0) % TILE
    if pad0:
        ext = lambda a, f: jnp.concatenate(
            [a, jnp.full((pad0,) + a.shape[1:], f, a.dtype)])
        o, d = ext(o, 0.0), ext(d, 1.0)
        t_min, t_max = ext(t_min, 0.0), ext(t_max, -jnp.inf)
    R = o.shape[0]
    n_tiles = R // TILE
    entry = phase_a_entry(scene, o, d, t_min, t_max, n_tiles, TILE,
                          interpret)

    phi = ray_features(o, d)
    phi_p = jnp.concatenate([phi, jnp.zeros((TILE, FEAT), jnp.float32)])
    tmin_p = jnp.concatenate([t_min, jnp.zeros((TILE,))])[:, None]
    bits = _idx_bits(C // scene.sub_chunks)
    key0 = _pack_tmax(jnp.concatenate(
        [t_max, jnp.full((TILE,), -jnp.inf)])[:, None], bits)

    # Pass 1: nearest S1 clusters per tile (no sort, fixed count).
    tids1, cids1, entry_rest = _toppass_worklist(entry, S1)
    key, pair = _run_worklist(tids1, cids1, phi_p, scene.tri_feats,
                              scene.sub_bounds, tmin_p, key0,
                              TILE=TILE, C=C, SUB=scene.sub_chunks,
                              n_blocks=int(tids1.shape[0]),
                              interpret=interpret)
    t = _t_from_keys(key, bits)

    # Pass 2: remaining candidates that could still beat a ray in the tile.
    tile_best_max = jnp.max(
        t[:n_tiles * TILE].reshape(n_tiles, TILE), axis=1)
    entry2 = jnp.where(entry_rest < tile_best_max[:, None], entry_rest,
                       jnp.inf)
    tids2, cids2, total2 = build_worklist(entry2, max_pairs)
    # Pass 2 seeds its carried bests from pass 1 (key AND pair), so its
    # outputs are already the merged result for every row.
    key, pair = _run_worklist(
        tids2, cids2, phi_p, scene.tri_feats, scene.sub_bounds, tmin_p,
        key[:, None], TILE=TILE, C=C, SUB=scene.sub_chunks,
        n_blocks=max_pairs, interpret=interpret, pair0=pair[:, None])
    t = _t_from_keys(key, bits)

    res = finalize_hits_exact(scene, pair[:R0], t[:R0], o[:R0], d[:R0])
    return res, total2


@partial(jax.jit, static_argnames=("TILE", "max_pairs", "interpret"))
def _phase_a_and_worklist(scene, o, d, t_min, t_max, *, TILE: int,
                          max_pairs: int, interpret: bool):
    """First half of the query: pad, interval phase A, worklist build.
    Split out so the host can read the true pair count and size the kernel
    grid to it (pow2-bucketed) instead of paying for worst-case capacity."""
    from ..accel.dense import ray_features
    R0 = o.shape[0]
    d = jnp.where(d == 0.0, 0.0, d)
    pad0 = (-R0) % TILE
    if pad0:
        ext = lambda a, f: jnp.concatenate(
            [a, jnp.full((pad0,) + a.shape[1:], f, a.dtype)])
        o, d = ext(o, 0.0), ext(d, 1.0)
        t_min, t_max = ext(t_min, 0.0), ext(t_max, -jnp.inf)
    R = o.shape[0]
    n_tiles = R // TILE
    entry = phase_a_entry(scene, o, d, t_min, t_max, n_tiles, TILE,
                          interpret)
    tids, cids, total = build_worklist(entry, max_pairs)
    phi = ray_features(o, d)
    phi_p = jnp.concatenate([phi, jnp.zeros((TILE, FEAT), jnp.float32)])
    tmin_p = jnp.concatenate([t_min, jnp.zeros((TILE,))])[:, None]
    bits = _idx_bits(scene.cluster_size // scene.sub_chunks)
    key0_p = _pack_tmax(jnp.concatenate(
        [t_max, jnp.full((TILE,), -jnp.inf)])[:, None], bits)
    touched = jnp.any(jnp.isfinite(entry), axis=1)
    return tids, cids, total, phi_p, tmin_p, key0_p, touched


@partial(jax.jit, static_argnames=("TILE", "n_blocks", "interpret"))
def _sweep_and_finalize(scene, tids, cids, phi_p, tmin_p, key0_p, touched,
                        *, TILE: int, n_blocks: int, interpret: bool):
    from ..accel.dense import finalize_hits_exact
    C = scene.cluster_size
    bits = _idx_bits(C // scene.sub_chunks)
    R0p = phi_p.shape[0] - TILE
    key, pair = _run_worklist(tids[:n_blocks], cids[:n_blocks], phi_p,
                              scene.tri_feats, scene.sub_bounds, tmin_p,
                              key0_p, TILE=TILE, C=C,
                              SUB=scene.sub_chunks, n_blocks=n_blocks,
                              interpret=interpret)
    t = _t_from_keys(key, bits)
    touched_r = jnp.repeat(touched, TILE)
    touched_r = jnp.concatenate([touched_r, jnp.zeros((TILE,), bool)])
    t = jnp.where(touched_r, t, jnp.inf)
    pair = jnp.where(touched_r, pair, -1)
    # phi rows carry the ray: phi = [d | o x d | o | 1 | invd...].
    o_r, d_r = phi_p[:R0p, 6:9], phi_p[:R0p, 0:3]
    return finalize_hits_exact(scene, pair[:R0p], t[:R0p], o_r, d_r)


@partial(jax.jit, static_argnames=("TILE", "cap", "interpret"))
def _topk_query(scene, o, d, t_min, t_max, *, TILE: int, cap: int,
                interpret: bool):
    from ..accel.dense import ray_features, finalize_hits_exact
    C = scene.cluster_size
    R0 = o.shape[0]
    d = jnp.where(d == 0.0, 0.0, d)
    pad0 = (-R0) % TILE
    if pad0:
        ext = lambda a, f: jnp.concatenate(
            [a, jnp.full((pad0,) + a.shape[1:], f, a.dtype)])
        o, d = ext(o, 0.0), ext(d, 1.0)
        t_min, t_max = ext(t_min, 0.0), ext(t_max, -jnp.inf)
    R = o.shape[0]
    n_tiles = R // TILE
    entry = phase_a_entry(scene, o, d, t_min, t_max, n_tiles, TILE,
                          interpret)
    tids, cids, _rest = _toppass_worklist(entry, cap)

    phi = ray_features(o, d)
    phi_p = jnp.concatenate([phi, jnp.zeros((TILE, FEAT), jnp.float32)])
    tmin_p = jnp.concatenate([t_min, jnp.zeros((TILE,))])[:, None]
    bits = _idx_bits(C // scene.sub_chunks)
    key0_p = _pack_tmax(jnp.concatenate(
        [t_max, jnp.full((TILE,), -jnp.inf)])[:, None], bits)
    key, pair = _run_worklist(tids, cids, phi_p, scene.tri_feats,
                              scene.sub_bounds, tmin_p, key0_p,
                              TILE=TILE, C=C, SUB=scene.sub_chunks,
                              n_blocks=int(tids.shape[0]),
                              interpret=interpret)
    t = _t_from_keys(key, bits)
    touched = jnp.repeat(jnp.any(jnp.isfinite(entry), axis=1), TILE)
    touched = jnp.concatenate([touched, jnp.zeros((TILE,), bool)])
    t = jnp.where(touched, t, jnp.inf)
    pair = jnp.where(touched, pair, -1)
    return finalize_hits_exact(scene, pair[:R0], t[:R0], o[:R0], d[:R0])


def closest_hit_dense_pallas_topk(scene, rays, *, tile: int = 512,
                                  cap: int = 48):
    """Trace-safe fixed-capacity query: each tile tests its nearest
    ``cap`` candidate clusters. EXACT whenever the scene has <= cap
    clusters (or no tile exceeds cap candidates); otherwise a principled
    nearest-first approximation with uniform per-tile behavior. This is
    the variant jitted pipelines (renderers) dispatch to — the auto-sized
    variant needs a host sync that cannot run under tracing."""
    batch = rays.batch_shape
    flat = lambda a: a.reshape((-1,) + a.shape[len(batch):])
    o = flat(rays.o)
    R = o.shape[0]
    TILE = min(tile, max(R, 8))
    cap = min(cap, scene.n_clusters)
    interpret = jax.default_backend() != "tpu"
    res = _topk_query(scene, o, flat(rays.d), flat(rays.t_min),
                      flat(rays.t_max), TILE=TILE, cap=cap,
                      interpret=interpret)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(batch + a.shape[1:]), res)


def closest_hit_dense_pallas_auto(scene, rays, *, tile: int = 512):
    """Closest hit with an auto-sized worklist: one host sync reads the
    true pair count and buckets the kernel grid to the next power of two,
    so sparse queries don't pay worst-case capacity and dense ones never
    overflow. The production entry point for renderers (see
    accel/dispatch.py)."""
    interpret = jax.default_backend() != "tpu"
    batch = rays.batch_shape
    flat = lambda a: a.reshape((-1,) + a.shape[len(batch):])
    o = flat(rays.o)
    R = o.shape[0]
    TILE = min(tile, max(R, 8))
    n_tiles = -(-R // TILE)
    hard = n_tiles * scene.n_clusters
    out = _phase_a_and_worklist(scene, o, flat(rays.d), flat(rays.t_min),
                                flat(rays.t_max), TILE=TILE, max_pairs=hard,
                                interpret=interpret)
    tids, cids, total, phi_p, tmin_p, best0_p, touched = out
    nb = int(total)                         # the one host sync
    nb = 1 << max(9, (max(nb, 1) - 1).bit_length())   # pow2, >= 512
    nb = min(nb, hard)
    res = _sweep_and_finalize(scene, tids, cids, phi_p, tmin_p, best0_p,
                              touched, TILE=TILE, n_blocks=nb,
                              interpret=interpret)
    # _sweep_and_finalize returns the TILE-padded row count; drop the
    # padding before restoring the caller's batch shape (R not a
    # multiple of TILE previously crashed the reshape).
    return jax.tree_util.tree_map(
        lambda a: a[:R].reshape(batch + a.shape[1:]), res)


def closest_hit_dense_pallas(scene, rays, *, tile: int = 256,
                             max_pairs_per_tile: int = 24,
                             interpret=None, check_overflow: bool = True,
                             passes: int = 2, nearest_first: int = 4):
    """Closest hit via the Pallas worklist kernel.

    passes=2 (default): nearest-``nearest_first`` clusters per tile first,
    then only candidates whose conservative entry can still beat a found
    hit — the best-t pruning the one-pass variant lacks. passes=1 tests
    every conservative candidate. ``check_overflow=False`` skips the host
    sync on the pair count (use when capacity is known ample)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch = rays.batch_shape
    flat = lambda a: a.reshape((-1,) + a.shape[len(batch):])
    o = flat(rays.o)
    R = o.shape[0]
    TILE = min(tile, max(R, 8))
    n_tiles = -(-R // TILE)
    max_pairs = min(max_pairs_per_tile * n_tiles,
                    n_tiles * scene.n_clusters)

    if passes == 2:
        res, total = _pallas_query2(
            scene, o, flat(rays.d), flat(rays.t_min), flat(rays.t_max),
            TILE=TILE, max_pairs=max_pairs, S1=nearest_first,
            interpret=interpret)
    else:
        res, total = _pallas_query(scene, o, flat(rays.d), flat(rays.t_min),
                                   flat(rays.t_max), TILE=TILE,
                                   max_pairs=max_pairs, interpret=interpret)
    if check_overflow and int(total) > max_pairs:
        raise RuntimeError(
            f"worklist overflow: {int(total)} pairs > capacity {max_pairs}; "
            f"raise max_pairs_per_tile")
    return jax.tree_util.tree_map(
        lambda a: a.reshape(batch + a.shape[1:]), res)
