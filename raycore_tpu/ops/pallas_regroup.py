"""Cluster-major regrouped Pallas sweep — per-subgroup candidate lists.

The worklist kernel in pallas_dense.py tests each candidate cluster
against a whole 512-1024-ray tile, so every ray pays for the union of
its tile's candidates (~22 clusters x 128 tris measured vs ~32 useful
triangles — docs/performance.md). This engine shrinks the candidate
granularity to G=32-ray *subgroups* while keeping the block shape the
MXU wants:

  1. Coarse phase A (per-tile interval culling, unchanged) emits
     (tile, cluster) pairs.
  2. Each surviving pair is refined against the tile's TILE/G subgroups
     (same interval test on per-subgroup stats) — pure XLA, ~60 flops
     per (pair, subgroup).
  3. Surviving (subgroup, cluster) candidates are sorted cluster-major
     and packed into blocks of SPB=16 subgroups that all need the SAME
     cluster; each cluster's list is padded to a block boundary with
     dummy-subgroup slots.
  4. The kernel gathers the 16 subgroups' ray-table rows via 16 small
     BlockSpec DMAs (scalar-prefetched indices), assembles a (512, 16)
     ray operand, runs ONE (512,16)@(16,4C) fp32 matmul + the
     Möller–Trumbore epilogue, and writes per-row (t-bits key, prim)
     exactly once — no carried bests, no revisiting, no aliasing.
  5. A ray appears once per candidate cluster, so duplicates are merged
     outside the kernel: sort rows by (ray, key) + take the first per
     ray (or segment_min), then one scatter back to ray order.

Semantics match the tile worklist engine (same featurized MT with
EDGE_EPS slack, same exact scalar finalize) with one improvement: keys
carry FULL-precision t bits (the tile engine truncates 7 mantissa bits
for its packed carried key), so the winner is the strict closest hit up
to featurized-evaluation rounding. Candidate sets stay conservative
supersets of the reachable clusters per ray, so results stay exact.

Reference hot-loop parity target: fast_intersect_triangle semantics
(/root/reference/src/instanced-bvh.jl:1756-1797) via the featurized
bilinear forms of accel/dense.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

from . import capacity_store as _cap_store
from ..core.triangle import safe_invdir
from ..core.triangle import INV_DIR_CLAMP as _INV_DIR_CLAMP
from .pallas_dense import (FEAT, _VMEM_PARAMS, _mm_sweep,
                           _t_from_keys, build_worklist, phase_a_entry)

INT32_MAX = 0x7FFFFFFF  # plain int: jnp constants can't be captured by kernels

# Ray-table layout: ray_features cols 0:13 (d, o x d, o, 1, invd) plus
# t_min in col 13 and t_max in col 14. Triangle feature rows 13/14 are
# zero, so the extra columns never perturb the matmul.
COL_TMIN = 13
COL_TMAX = 14


def ray_table(o, d, t_min, t_max, G: int):
    """(n_sub + 1, G, FEAT) per-subgroup ray table; the trailing dummy
    subgroup (zeros, t_max=-inf) absorbs padding slots."""
    from ..accel.dense import ray_features
    R = o.shape[0]
    n_sub = R // G
    phi = ray_features(o, d)
    phi = phi.at[:, COL_TMIN].set(t_min)
    phi = phi.at[:, COL_TMAX].set(t_max)
    tbl = phi.reshape(n_sub, G, FEAT)
    dummy = jnp.zeros((1, G, FEAT), jnp.float32) \
        .at[:, :, COL_TMAX].set(-jnp.inf)
    return jnp.concatenate([tbl, dummy])


def subgroup_stats(o, d, t_min, t_max, G: int):
    """(n_tiles*, SPT-grouped) interval stats per G-ray subgroup:
    cols [o_lo(3) o_hi(3) i_lo(3) i_hi(3) tmin_lo tmax_hi] -> (n_sub, 14)."""
    R = o.shape[0]
    n_sub = R // G
    invd = safe_invdir(jnp.where(d == 0.0, 0.0, d))
    shp = lambda a: a.reshape((n_sub, G) + a.shape[1:])
    o_t, i_t = shp(o), shp(invd)
    return jnp.concatenate([
        jnp.min(o_t, 1), jnp.max(o_t, 1),
        jnp.min(i_t, 1), jnp.max(i_t, 1),
        jnp.min(shp(t_min), 1)[:, None],
        jnp.max(shp(t_max), 1)[:, None]], axis=1)


def refine_pairs(stats, tids, cids, cluster_min, cluster_max,
                 SPT: int, n_tiles: int):
    """Interval-test each coarse (tile, cluster) pair against the tile's
    SPT subgroups. Returns (P, SPT) conservative entry bounds (+inf =
    provably no ray of the subgroup enters the cluster)."""
    P = tids.shape[0]
    n_sub = stats.shape[0]
    # Gather at tile granularity: one (SPT*14)-wide row per pair.
    stats_t = stats.reshape(n_tiles, SPT * 14)
    stats_t = jnp.concatenate(
        [stats_t, jnp.zeros((1, SPT * 14), jnp.float32)])    # dummy tile
    st = jnp.take(stats_t, jnp.minimum(tids, n_tiles), axis=0) \
        .reshape(P, SPT, 14)
    bmin = jnp.take(cluster_min, cids, axis=0)               # (P, 3)
    bmax = jnp.take(cluster_max, cids, axis=0)

    t_lo = jnp.full((P, SPT), -jnp.inf)
    t_hi = jnp.full((P, SPT), jnp.inf)
    CL = jnp.float32(_INV_DIR_CLAMP)   # exact safe_invdir clamp
    for a in range(3):
        lo8 = jnp.full((P, SPT), jnp.inf)
        hi8 = jnp.full((P, SPT), -jnp.inf)
        for b in (bmin[:, a:a + 1], bmax[:, a:a + 1]):       # (P, 1)
            for oc in (st[:, :, a], st[:, :, 3 + a]):        # (P, SPT)
                diff = b - oc
                for ic in (st[:, :, 6 + a], st[:, :, 9 + a]):
                    prod = diff * ic
                    lo8 = jnp.minimum(lo8, prod)
                    hi8 = jnp.maximum(hi8, prod)
        # Near-parallel rays inside the slab never exit it; the clamped
        # products say they exit at |o-b|*1e5, which can drop a truly hit
        # cluster (found at 1M scale, C=64: ~1e-4 of rays). Widen the
        # axis when the subgroup may contain such a ray.
        par = (st[:, :, 9 + a] >= CL) | (st[:, :, 6 + a] <= -CL)
        ovl = (st[:, :, 3 + a] >= bmin[:, a:a + 1]) \
            & (st[:, :, a] <= bmax[:, a:a + 1])
        wide = par & ovl
        t_lo = jnp.maximum(t_lo, jnp.where(wide, -jnp.inf, lo8))
        t_hi = jnp.minimum(t_hi, jnp.where(wide, jnp.inf, hi8))
    entry = jnp.maximum(t_lo, st[:, :, 12])
    exit_ = jnp.minimum(t_hi, st[:, :, 13])
    ok = (entry <= exit_) & (tids < n_tiles)[:, None]
    return jnp.where(ok, entry, jnp.inf)


def pack_presorted_cluster_major(cid_s, sub_s, valid_s, *, SPB: int,
                                 n_sub: int, B_cap: int, K: int):
    """Pack an ALREADY cluster-contiguous (cid, sub, valid) list into
    blocks of SPB subgroups — pure rank arithmetic, no sort. Requires
    equal cids adjacent and every invalid entry carrying cid >= K."""
    N = sub_s.shape[0]
    i = jnp.arange(N, dtype=jnp.int32)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), cid_s[1:] != cid_s[:-1]])
    first = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, i, 0))
    rank = i - first
    slot = rank % SPB
    starts = valid_s & (slot == 0)
    block_id = jnp.cumsum(starts.astype(jnp.int32)) - 1
    total = jnp.sum(starts.astype(jnp.int32))
    block_id = jnp.where(valid_s, block_id, B_cap)          # drop invalid

    block_cid = jnp.full((B_cap,), -1, jnp.int32).at[
        jnp.where(starts, block_id, B_cap)].set(cid_s, mode="drop")
    block_subs = jnp.full((B_cap, SPB), n_sub, jnp.int32).at[
        block_id, slot].set(sub_s, mode="drop")
    return block_cid, block_subs, total


def group_flat_cluster_major(sub, cid, valid, *, SPB: int, n_sub: int,
                             B_cap: int, K: int):
    """Pack flat (subgroup, cluster) candidates into cluster-major blocks
    of SPB subgroups. Returns (block_cid (B_cap,), block_subs
    (B_cap, SPB), total_blocks). block_cid = -1 marks padding blocks;
    padding slots point at the dummy subgroup ``n_sub``."""
    cid_k = jnp.where(valid, cid, K)              # invalids sort last
    cid_s, sub_s = jax.lax.sort((cid_k, sub), num_keys=1, is_stable=False)
    valid_s = cid_s < K
    return pack_presorted_cluster_major(cid_s, sub_s, valid_s, SPB=SPB,
                                        n_sub=n_sub, B_cap=B_cap, K=K)


def group_cluster_major(tids, cids, fine_entry, *, SPT: int, SPB: int,
                        n_sub: int, B_cap: int, K: int):
    """group_flat_cluster_major over the (coarse pair x subgroup) grid."""
    P = tids.shape[0]
    N = P * SPT
    sub = (tids[:, None] * SPT
           + jnp.arange(SPT, dtype=jnp.int32)[None, :]).reshape(N)
    cid = jnp.broadcast_to(cids[:, None], (P, SPT)).reshape(N)
    valid = jnp.isfinite(fine_entry).reshape(N)
    return group_flat_cluster_major(sub, cid, valid, SPB=SPB, n_sub=n_sub,
                                    B_cap=B_cap, K=K)


def _kernel(subs_ref, cids_ref, *refs, C: int, G: int, SPB: int,
            edge_eps: float, payload: str = "prim", chunk_base: int = 0,
            U: int = 1):
    """U = blocks swept per grid step (RAYCORE_REGROUP_UNROLL): the
    per-step fixed cost (scalar-prefetch DMA issue + grid bookkeeping,
    the 6.69-vs-2.3 us/block gap in the round-4 decomposition) amortizes
    over U independent (ROWS, 4C) sweeps back-to-back on the MXU."""
    tbl_refs = refs[:U * SPB]
    feats_refs = refs[U * SPB:U * SPB + U]
    key_out, pair_out = refs[U * SPB + U], refs[U * SPB + U + 1]
    b = pl.program_id(0)
    ROWS = G * SPB
    for u in range(U):
        cid = cids_ref[b * U + u]

        @pl.when(cid >= 0)
        def _(u=u, cid=cid):
            tbl = jnp.concatenate(
                [r[0] for r in tbl_refs[u * SPB:(u + 1) * SPB]], axis=0)
            _sweep_tbl(tbl, feats_refs[u][0], key_out, pair_out,
                       cid, b * U + u, C=C, G=G, SPB=SPB,
                       edge_eps=edge_eps, payload=payload,
                       chunk_base=chunk_base, row_off=u * ROWS)


def _kernel_contig(cids_ref, tbl_ref, feats_ref, key_out, pair_out, *,
                   C: int, G: int, SPB: int, edge_eps: float,
                   payload: str = "prim", chunk_base: int = 0):
    """Same sweep with the block's (ROWS, FEAT) ray table arriving as ONE
    contiguous sequential-grid DMA instead of SPB scalar-prefetch gathers
    (tbl_mode="contig"; the rows are materialized in block order by one
    wide XLA gather in run_regrouped)."""
    b = pl.program_id(0)
    cid = cids_ref[b]

    @pl.when(cid >= 0)
    def _():
        _sweep_tbl(tbl_ref[0], feats_ref[0], key_out, pair_out, cid, b,
                   C=C, G=G, SPB=SPB, edge_eps=edge_eps, payload=payload,
                   chunk_base=chunk_base)


def _sweep_tbl(tbl, feats, key_out, pair_out, cid, b, *, C: int, G: int,
               SPB: int, edge_eps: float, payload: str, chunk_base: int,
               row_off: int = 0):
    tmin = tbl[:, COL_TMIN:COL_TMIN + 1]
    tmax = tbl[:, COL_TMAX:COL_TMAX + 1]
    # Zero the tmin/tmax carrier columns for the matmul: their feature
    # rows are zero, but inf * 0 = NaN would poison every quantity.
    cols = jax.lax.broadcasted_iota(jnp.int32, tbl.shape, 1)
    phi_mm = jnp.where(cols >= COL_TMIN, 0.0, tbl)
    q = _mm_sweep(phi_mm, feats)                         # (ROWS,4C)
    det = q[:, 0 * C:1 * C]
    udet = q[:, 1 * C:2 * C]
    vdet = q[:, 2 * C:3 * C]
    tdet = q[:, 3 * C:4 * C]
    r = 1.0 / det
    u = udet * r
    v = vdet * r
    t = tdet * r
    e = edge_eps
    ok = (u >= -e) & (u <= 1.0 + e) & (v >= -e) & (u + v <= 1.0 + e) \
        & (t >= tmin) & (t <= tmax)
    # Full-precision t bits as the key (strict closest semantics —
    # no mantissa truncation), winning lane via a second reduction
    # (measured neutral vs the packed single-reduction variant).
    kb = jax.lax.bitcast_convert_type(jnp.maximum(t, 0.0), jnp.int32)
    kb = jnp.where(ok, kb, INT32_MAX)
    key_min = jnp.min(kb, axis=1, keepdims=True)             # (ROWS,1)
    ids = jax.lax.broadcasted_iota(jnp.int32, kb.shape, 1)
    lane = jnp.min(jnp.where(kb == key_min, ids, jnp.int32(C)),
                   axis=1, keepdims=True)   # smallest prim on ties
    ROWS = G * SPB
    key_out[row_off:row_off + ROWS, :] = key_min
    if payload == "pairrow":
        # Instanced engine payload: (global block-row index, lane) —
        # the same prim can be hit through different instances, so
        # the winner must identify the (pair, lane), not the prim.
        # chunk_base re-globalizes program_id across chunked calls.
        rows = jax.lax.broadcasted_iota(jnp.int32, key_min.shape, 0)
        base = ((chunk_base + b) * SPB + rows // G) * C
    else:
        base = cid * C
    pair_out[row_off:row_off + ROWS, :] = jnp.where(
        key_min == INT32_MAX, -1, base + lane)


REGROUP_CHUNK = 4096    # blocks per pallas_call (scalar ids live in SMEM)


def _tbl_mode_default() -> str:
    """Sweep ray-table delivery: "gather" = SPB scalar-prefetch BlockSpec
    DMAs per block (no materialization); "contig" = materialize the block
    rows with one wide XLA gather (bandwidth-bound; tbl rows are 2 KB so
    the gather runs at ~row-latency over n_blocks*SPB rows, ~2-3 ms at
    the 1M-ray headline) and stream them as ONE sequential-grid DMA per
    block. Worth it iff the per-block scalar-prefetch gather cost exceeds
    ~0.25 us/subgroup (tools/probe_block_overhead.py measures exactly
    this gap). Env: RAYCORE_REGROUP_TBL, resolved at trace time."""
    return _os.environ.get("RAYCORE_REGROUP_TBL", "gather")


def _unroll_default() -> int:
    """Blocks swept per grid step (RAYCORE_REGROUP_UNROLL, default 1).
    U>1 amortizes the per-grid-step fixed cost (the 6.69-vs-2.3 us/block
    matmul-issue gap, docs/performance.md round-4 decomposition) over U
    back-to-back sweeps. Device A/B (round 5, part C): a WASH at the 1M
    headline — the fixed term is per-block MXU issue, which U cannot
    amortize.

    CONTRACT: resolved when the OUTER stage/query jit first traces a
    config in this process (the outer jits do not carry unroll as a
    static arg). Changing the env after that is silently ignored for
    already-traced configs — set it before the first query, or A/B in
    separate processes (the evidence batches do)."""
    return int(_os.environ.get("RAYCORE_REGROUP_UNROLL", "1"))


@partial(jax.jit, static_argnames=("G", "SPB", "C", "n_blocks", "interpret",
                                   "payload", "tbl_mode", "unroll"))
def run_regrouped(block_subs, block_cid, tbl, feats, *, G: int, SPB: int,
                  C: int, n_blocks: int, interpret: bool,
                  payload: str = "prim", tbl_mode: str = "gather",
                  unroll: int = 1):
    """Sweep ``n_blocks`` cluster-major blocks. Returns (key, pair) of
    shape (n_blocks*SPB*G,) in block-row order (use block_subs for the
    row -> ray mapping). payload="pairrow" makes the winner id encode
    (block-row, lane) instead of (cluster, lane) — the instanced engine
    needs the pair to recover the instance. ``unroll`` is a static arg
    here, but the production callers resolve _unroll_default() INSIDE
    their own outer jits — see _unroll_default's contract for when env
    changes actually take effect."""
    ROWS = G * SPB

    # Scalar-prefetch arrays live in SMEM, where 2D minor dims pad to the
    # 128-lane width (8x waste) — pass the subgroup ids flattened 1D.
    def tbl_spec(s):
        return pl.BlockSpec(
            (1, G, FEAT),
            lambda b, subs, cids, s=s: (subs[b * SPB + s], 0, 0))

    keys, pairs = [], []
    n_chunks = -(-n_blocks // REGROUP_CHUNK)
    for ch in range(n_chunks):
        lo = ch * REGROUP_CHUNK
        sz = min(REGROUP_CHUNK, n_blocks - lo)
        U = unroll if (unroll > 1 and sz % unroll == 0
                       and tbl_mode != "contig") else 1
        if U > 1:
            def tbl_spec_u(u, s):
                return pl.BlockSpec(
                    (1, G, FEAT),
                    lambda b, subs, cids, u=u, s=s: (
                        subs[(b * U + u) * SPB + s], 0, 0))

            def feats_spec_u(u):
                return pl.BlockSpec(
                    (1, FEAT, 4 * C),
                    lambda b, subs, cids, u=u: (
                        jnp.maximum(cids[b * U + u], 0), 0, 0))

            kernel = partial(_kernel, C=C, G=G, SPB=SPB, edge_eps=1e-5,
                             payload=payload, chunk_base=lo, U=U)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(sz // U,),
                in_specs=[tbl_spec_u(u, s) for u in range(U)
                          for s in range(SPB)] + [
                    feats_spec_u(u) for u in range(U)],
                out_specs=[pl.BlockSpec(
                    (U * ROWS, 1),
                    lambda b, subs, cids: (b, 0))] * 2,
            )
            ins = (block_subs[lo:lo + sz].reshape(-1),
                   block_cid[lo:lo + sz]) + tuple([tbl] * (U * SPB)) \
                + tuple([feats] * U)
            k, p = pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((sz * ROWS, 1),
                                                jnp.int32)] * 2,
                compiler_params=_VMEM_PARAMS,
                interpret=interpret,
            )(*ins)
            keys.append(k[:, 0])
            pairs.append(p[:, 0])
            continue
        if tbl_mode == "contig":
            tblb = jnp.take(tbl, block_subs[lo:lo + sz].reshape(-1),
                            axis=0).reshape(sz, ROWS, FEAT)
            kernel = partial(_kernel_contig, C=C, G=G, SPB=SPB,
                             edge_eps=1e-5, payload=payload, chunk_base=lo)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(sz,),
                in_specs=[
                    pl.BlockSpec((1, ROWS, FEAT),
                                 lambda b, cids: (b, 0, 0)),
                    pl.BlockSpec((1, FEAT, 4 * C),
                                 lambda b, cids: (jnp.maximum(cids[b], 0),
                                                  0, 0)),
                ],
                out_specs=[pl.BlockSpec((ROWS, 1), lambda b, cids: (b, 0))
                           ] * 2,
            )
            ins = (block_cid[lo:lo + sz], tblb, feats)
        else:
            kernel = partial(_kernel, C=C, G=G, SPB=SPB, edge_eps=1e-5,
                             payload=payload, chunk_base=lo)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(sz,),
                in_specs=[tbl_spec(s) for s in range(SPB)] + [
                    pl.BlockSpec((1, FEAT, 4 * C),
                                 lambda b, subs, cids: (
                                     jnp.maximum(cids[b], 0), 0, 0)),
                ],
                out_specs=[pl.BlockSpec((ROWS, 1),
                                        lambda b, subs, cids: (b, 0))] * 2,
            )
            ins = (block_subs[lo:lo + sz].reshape(-1),
                   block_cid[lo:lo + sz]) + tuple([tbl] * SPB) + (feats,)
        k, p = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((sz * ROWS, 1), jnp.int32)] * 2,
            compiler_params=_VMEM_PARAMS,
            interpret=interpret,
        )(*ins)
        keys.append(k[:, 0])
        pairs.append(p[:, 0])
    if not keys:
        z = jnp.zeros((0,), jnp.int32)
        return z, z
    return jnp.concatenate(keys), jnp.concatenate(pairs)


# --- packed sub-cluster sweep ------------------------------------------------
# On-device probe (tools/probe_matmul_shapes.py, v5e): Pallas matmul cost
# scales with M x N x passes and is INDEPENDENT of K up to the MXU's 128
# depth — (512,128)@(128,512) HIGHEST costs the same 2.3 us as
# (512,16)@(16,512), and N=128 costs 0.72 us. Two consequences this
# engine exploits, keeping full fp32 HIGHEST exactness:
#   1. Sub-cluster candidates: refine to C_eff = C/SUBC-triangle
#      sub-chunks (the sub-chunk-major tri_feats layout already stores
#      them as contiguous (FEAT, 4*C_eff) column slices) — 2.4x fewer
#      candidates/ray at C_eff=32 vs C=128 on the heightfield — and the
#      matmul's N shrinks to 4*C_eff with every output column useful.
#   2. Block-diagonal K-packing: PACKS sub-blocks (each SPB_sub
#      subgroups sharing one sub-cluster) share ONE matmul. phi_big is
#      (ROWS, PACKS*16) with sub-block s's rows occupying feature
#      columns 16s:16s+16 (zeros elsewhere); feats_big stacks the PACKS
#      feature slices along K. Row r's outputs are then exactly its own
#      sub-cluster's quantities — the zero blocks select them — so the
#      (ROWS, 4*C_eff) output is 100% useful at K = PACKS*16 <= 128.


def subchunk_bounds(scene):
    """(K*SUBC, 3) sub-chunk AABBs unpacked from scene.sub_bounds."""
    K = scene.n_clusters
    SUBC = scene.sub_chunks
    sb = scene.sub_bounds[:, 0, : SUBC * 6].reshape(K, SUBC, 6)
    return (sb[:, :, 0:3].reshape(K * SUBC, 3),
            sb[:, :, 3:6].reshape(K * SUBC, 3))


def _kernel_packed(subs_ref, cids_ref, *refs, C_eff: int, G: int,
                   SPB_sub: int, PACKS: int, edge_eps: float,
                   payload: str, chunk_base: int):
    n_tbl = PACKS * SPB_sub
    tbl_refs = refs[:n_tbl]
    feats_refs = refs[n_tbl:n_tbl + PACKS]
    key_out, pair_out = refs[n_tbl + PACKS], refs[n_tbl + PACKS + 1]
    b = pl.program_id(0)
    RSUB = SPB_sub * G
    ROWS = PACKS * RSUB
    cids = [cids_ref[b * PACKS + s] for s in range(PACKS)]
    vmax = cids[0]
    for s in range(1, PACKS):
        vmax = jnp.maximum(vmax, cids[s])

    @pl.when(vmax >= 0)
    def _():
        tbl = jnp.concatenate([r[0] for r in tbl_refs], axis=0)  # (ROWS,16)
        feats = jnp.concatenate([f[0] for f in feats_refs],
                                axis=0)                   # (PACKS*16, 4Ce)
        KX = PACKS * FEAT
        rows = jax.lax.broadcasted_iota(jnp.int32, (ROWS, KX), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (ROWS, KX), 1)
        # Block-diagonal mask; also zeroes the t_min/t_max carrier
        # columns (their feature rows are zero, but inf * 0 = NaN).
        mask = (rows // RSUB == cols // FEAT) & (cols % FEAT < COL_TMIN)
        phi_rep = jnp.concatenate([tbl] * PACKS, axis=1)  # (ROWS, KX)
        phi_big = jnp.where(mask, phi_rep, 0.0)
        q = _mm_sweep(phi_big, feats)                  # (ROWS, 4Ce)
        tmin = tbl[:, COL_TMIN:COL_TMIN + 1]
        tmax = tbl[:, COL_TMAX:COL_TMAX + 1]
        Ce = C_eff
        det = q[:, 0 * Ce:1 * Ce]
        udet = q[:, 1 * Ce:2 * Ce]
        vdet = q[:, 2 * Ce:3 * Ce]
        tdet = q[:, 3 * Ce:4 * Ce]
        r = 1.0 / det
        u = udet * r
        v = vdet * r
        t = tdet * r
        e = edge_eps
        ok = (u >= -e) & (u <= 1.0 + e) & (v >= -e) & (u + v <= 1.0 + e) \
            & (t >= tmin) & (t <= tmax)
        # Per-row sub-cluster id (padding sub-blocks carry cid -1).
        rid = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0) // RSUB
        cid_col = jnp.zeros((ROWS, 1), jnp.int32)
        for s in range(PACKS):
            cid_col = jnp.where(rid == s, cids[s], cid_col)
        ok = ok & (cid_col >= 0)
        kb = jax.lax.bitcast_convert_type(jnp.maximum(t, 0.0), jnp.int32)
        kb = jnp.where(ok, kb, INT32_MAX)
        key_min = jnp.min(kb, axis=1, keepdims=True)
        ids = jax.lax.broadcasted_iota(jnp.int32, kb.shape, 1)
        lane = jnp.min(jnp.where(kb == key_min, ids, jnp.int32(Ce)),
                       axis=1, keepdims=True)
        key_out[:] = key_min
        if payload == "pairrow":
            rg = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0) // G
            base = ((chunk_base + b) * n_tbl + rg) * Ce
        else:
            base = cid_col * Ce
        pair_out[:] = jnp.where(key_min == INT32_MAX, -1, base + lane)


@partial(jax.jit, static_argnames=("G", "SPB_sub", "PACKS", "C_eff",
                                   "SUBC", "n_blocks", "interpret",
                                   "payload"))
def run_packed(block_subs, block_cid, tbl, feats, *, G: int, SPB_sub: int,
               PACKS: int, C_eff: int, SUBC: int, n_blocks: int,
               interpret: bool, payload: str = "prim"):
    """Sweep n_blocks sub-cluster blocks, PACKS per grid step. block_cid
    indexes sub-clusters (cluster*SUBC + chunk); feats is the scene's
    (K, FEAT, 4*C) sub-chunk-major table, sliced per sub-chunk by the
    BlockSpec. n_blocks must be a multiple of PACKS."""
    assert n_blocks % PACKS == 0
    RSUB = SPB_sub * G
    ROWS = PACKS * RSUB
    n_tbl = PACKS * SPB_sub

    def tbl_spec(i):
        return pl.BlockSpec(
            (1, G, FEAT),
            lambda b, subs, cids, i=i: (subs[b * n_tbl + i], 0, 0))

    def feats_spec(s):
        def ix(b, subs, cids, s=s):
            q = jnp.maximum(cids[b * PACKS + s], 0)
            return (q // SUBC, 0, q % SUBC)
        return pl.BlockSpec((1, FEAT, 4 * C_eff), ix)

    keys, pairs = [], []
    steps_total = n_blocks // PACKS
    chunk_steps = REGROUP_CHUNK // PACKS
    n_chunks = -(-steps_total // chunk_steps)
    for ch in range(n_chunks):
        lo = ch * chunk_steps
        sz = min(chunk_steps, steps_total - lo)
        kernel = partial(_kernel_packed, C_eff=C_eff, G=G,
                         SPB_sub=SPB_sub, PACKS=PACKS, edge_eps=1e-5,
                         payload=payload, chunk_base=lo)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(sz,),
            in_specs=[tbl_spec(i) for i in range(n_tbl)] + [
                feats_spec(s) for s in range(PACKS)],
            out_specs=[pl.BlockSpec((ROWS, 1),
                                    lambda b, subs, cids: (b, 0))] * 2,
        )
        k, p = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((sz * ROWS, 1), jnp.int32)] * 2,
            compiler_params=_VMEM_PARAMS,
            interpret=interpret,
        )(block_subs[lo * PACKS:(lo + sz) * PACKS].reshape(-1),
          block_cid[lo * PACKS:(lo + sz) * PACKS],
          *([tbl] * n_tbl), *([feats] * PACKS))
        keys.append(k[:, 0])
        pairs.append(p[:, 0])
    if not keys:
        z = jnp.zeros((0,), jnp.int32)
        return z, z
    return jnp.concatenate(keys), jnp.concatenate(pairs)


def combine_rows_grouped(keys, pairs, block_subs, n_blocks: int, G: int,
                         SPB: int, n_sub: int):
    """Merge per-(subgroup, cluster) result rows into per-subgroup bests
    WITHOUT touching individual scalar rows: rows stay (subgroup-row, G)
    shaped, only the n_blocks*SPB subgroup ids are argsorted, then a
    sorted-segment min reduces each subgroup's duplicate rows (one per
    candidate cluster). ~10x cheaper than sorting the scalar rows.
    Returns per-ray (key, pair) of shape (n_sub*G,)."""
    n_rows = n_blocks * SPB
    kr = keys.reshape(n_rows, G)
    pr = pairs.reshape(n_rows, G)
    subs = block_subs[:n_blocks].reshape(n_rows)
    order = jnp.argsort(subs)
    subs_s = jnp.take(subs, order)
    kr = jnp.take(kr, order, axis=0)
    pr = jnp.take(pr, order, axis=0)
    # Sorted-segment min (measured ~3x cheaper than a log-shift segmented
    # min at these shapes); empty segments keep the INT32_MAX identity.
    kk = jax.ops.segment_min(kr, subs_s, num_segments=n_sub + 1,
                             indices_are_sorted=True)
    tied = kr == jnp.take(kk, subs_s, axis=0)
    pp = jax.ops.segment_min(jnp.where(tied, pr, INT32_MAX), subs_s,
                             num_segments=n_sub + 1,
                             indices_are_sorted=True)
    pp = jnp.where(pp == INT32_MAX, -1, pp)
    return kk[:n_sub].reshape(-1), pp[:n_sub].reshape(-1)


def combine_rows(keys, pairs, ray_ids, n_segments: int, method: str = "sort"):
    """Merge per-(subgroup, cluster) rows into per-ray bests.
    Rows with key == INT32_MAX (no candidate hit) and rows mapping to the
    dummy segment are naturally dropped (INT32_MAX decodes to NaN)."""
    if method == "segment":
        seg_key = jax.ops.segment_min(keys, ray_ids,
                                      num_segments=n_segments)
        pick = (keys == jnp.take(seg_key, ray_ids)) & (keys != INT32_MAX)
        seg_pair = jax.ops.segment_min(
            jnp.where(pick, pairs, INT32_MAX), ray_ids,
            num_segments=n_segments)
        seg_pair = jnp.where(seg_pair == INT32_MAX, -1, seg_pair)
        return seg_key, seg_pair
    # num_keys=3: exact-equal t resolves to the smallest prim index,
    # matching the brute oracle's first-wins argmin.
    rk, kk, pk = jax.lax.sort((ray_ids, keys, pairs), num_keys=3,
                              is_stable=False)
    pk = jnp.where(kk == INT32_MAX, -1, pk)       # no-candidate rows
    firstmask = jnp.concatenate([jnp.ones((1,), bool), rk[1:] != rk[:-1]])
    idx = jnp.where(firstmask, rk, n_segments)        # dups -> dropped
    out_key = jnp.full((n_segments,), INT32_MAX, jnp.int32).at[idx].set(
        kk, mode="drop")
    out_pair = jnp.full((n_segments,), -1, jnp.int32).at[idx].set(
        pk, mode="drop")
    return out_key, out_pair


def nearest_cluster_per_subgroup(tids, cids, fine, n_tiles: int, SPT: int,
                                 K: int):
    """Per subgroup, the candidate cluster with the smallest conservative
    entry bound (K where a subgroup has no candidates). fine is (P, SPT)
    with tids sorted tile-major (dummy pairs have tids == n_tiles)."""
    e = jnp.where(jnp.isfinite(fine), fine, jnp.float32(3e38))
    emin = jax.ops.segment_min(e, tids, num_segments=n_tiles + 1,
                               indices_are_sorted=True)
    tied = (e == jnp.take(emin, tids, axis=0)) & jnp.isfinite(fine)
    cidb = jnp.broadcast_to(cids[:, None], e.shape)
    csel = jax.ops.segment_min(jnp.where(tied, cidb, K), tids,
                               num_segments=n_tiles + 1,
                               indices_are_sorted=True)
    return csel[:n_tiles].reshape(-1)                 # (n_sub,)


def _exact_wave_ub_t(scene, p1, o, d, t_min, t_max):
    """Exact per-ray upper bound on the best t, from the wave's selected
    winners (relaxed winner-selection modes only). Recomputes the
    selected pair with full-precision scalar Möller–Trumbore under the
    engines' EDGE_EPS acceptance slack: a pair that passes exact
    acceptance is an engine-admissible hit, so its exact t bounds the
    true best from above; anything else (miss sentinel, exact-rejected,
    out of [t_min, t_max]) contributes inf = prune nothing for that ray.
    [ADVICE r4 medium: bf16x3 error is relative to product magnitudes,
    so no t-relative inflation of the relaxed keys is sound.]"""
    from ..accel.dense import EDGE_EPS
    from ..accel.types import i32_as_f32
    valid = p1 >= 0
    rows = jnp.take(scene.prims_hot[:, :9], jnp.clip(p1, 0, None), axis=0)
    v = i32_as_f32(rows).reshape(-1, 3, 3)
    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    s1 = jnp.cross(d, e2)
    det = jnp.sum(s1 * e1, axis=-1)
    r = jnp.where(det != 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    dv = o - v0
    u = jnp.sum(dv * s1, axis=-1) * r
    s2 = jnp.cross(dv, e1)
    w = jnp.sum(d * s2, axis=-1) * r
    t = jnp.sum(e2 * s2, axis=-1) * r
    e = EDGE_EPS
    ok = valid & (det != 0.0) & (u >= -e) & (u <= 1.0 + e) & (w >= -e) \
        & (u + w <= 1.0 + e) & (t >= t_min) & (t <= t_max)
    return jnp.where(ok, t, jnp.inf)


def _stage1_pruned_core(scene, o, d, t_min, t_max, TILE: int, G: int,
                        SPB: int, P_cap: int, interpret: bool,
                        waves: int = 1, nb1=None):
    """Ordered-wave stage1: refine, sweep each subgroup's ``waves``
    NEAREST candidate clusters (by conservative slab entry; one
    statically-bounded grid — no extra host sync), then prune the
    remaining candidates against the per-subgroup best-t upper bound.
    Pruning is conservative: a cluster whose entry bound exceeds every
    ray's current best cannot improve any hit, so exactness holds.

    waves=1 is the classic passes=2 two-pass machine. The W-wave
    generalization is the round-4 architecture-decision prototype: on
    depth-complex scenes (tools/wave_sim.py, 1M-tri blobby, G=32
    cs=128) W=3-4 sweeps 674 tris/ray vs 1196 unordered (1.78x) and
    1062 for W=1 (which barely pays); the per-subgroup ordered floor is
    383. Sweeping all W choices in ONE grid gives the same final bound
    as sequential waves — exact Möller–Trumbore best-t is order
    independent — at a single dispatch."""
    K = scene.n_clusters
    C = scene.cluster_size
    SPT = TILE // G
    R = o.shape[0]
    n_tiles = R // TILE
    n_sub = R // G
    B_cap = P_cap * SPT // SPB + K + 1

    entry = phase_a_entry(scene, o, d, t_min, t_max, n_tiles, TILE,
                          interpret)
    tids, cids, coarse_total = build_worklist(entry, P_cap)
    stats = subgroup_stats(o, d, t_min, t_max, G)
    fine = refine_pairs(stats, tids, cids, scene.cluster_min,
                        scene.cluster_max, SPT, n_tiles)
    tbl = ray_table(o, d, t_min, t_max, G)
    tclamp = jnp.minimum(tids, n_tiles)

    # Per subgroup, the `waves` nearest candidate clusters (iterated
    # exclusion: W segmented min-reductions over the pair rows).
    chosen_all = []
    fine_w = fine
    for _ in range(waves):
        chosen = nearest_cluster_per_subgroup(tids, cids, fine_w, n_tiles,
                                              SPT, K)
        chosen_all.append(chosen)
        ch_t = jnp.take(jnp.concatenate(
            [chosen.reshape(n_tiles, SPT),
             jnp.full((1, SPT), K, jnp.int32)]), tclamp, axis=0)
        fine_w = jnp.where(cids[:, None] == ch_t, jnp.inf, fine_w)

    # Wave sweep: all W choices of every subgroup in one grid.
    chf = jnp.stack(chosen_all, axis=1).reshape(-1)   # (n_sub * W,)
    subrep = jnp.repeat(jnp.arange(n_sub, dtype=jnp.int32), waves)
    B1 = n_sub * waves // SPB + K + 1
    bc1, bs1, tot1 = group_flat_cluster_major(
        subrep, jnp.minimum(chf, K - 1), chf < K,
        SPB=SPB, n_sub=n_sub, B_cap=B1, K=K)
    if nb1 is not None:
        # Predicted wave grid (warm fused path): the static worst-case
        # bound pads ~K no-op grid steps per sweep (~8K at the 1M blobby
        # config); slice to the validated prediction instead — tot1
        # rides the totals readback, a miss falls back to two-stage.
        B1 = min(nb1, B1)
        bc1, bs1 = bc1[:B1], bs1[:B1]
    k1r, p1r = run_regrouped(bs1, bc1, tbl, scene.tri_feats, G=G, SPB=SPB,
                             C=C, n_blocks=B1, interpret=interpret,
                             tbl_mode=_tbl_mode_default(),
                             unroll=_unroll_default())
    k1, p1 = combine_rows_grouped(k1r, p1r, bs1, B1, G, SPB, n_sub)

    # Per-subgroup upper bound on the remaining useful entry t. fine_w
    # already carries inf at every swept (subgroup, cluster), so the
    # threshold alone excludes the wave set from the remainder.
    t1 = jnp.where(k1 == INT32_MAX, jnp.inf, _t_from_keys(k1, 0))
    from .pallas_dense import _MM_MODE
    if _MM_MODE:
        # Relaxed winner-selection precision (RAYCORE_MM_PRECISION): the
        # wave keys' error is relative to the accumulated PRODUCT
        # magnitudes, not to t itself, so under cancellation (tiny
        # tdet/det vs term magnitudes) NO t-relative margin bounds the
        # under-estimate — pruning against the relaxed keys could drop
        # the cluster holding the true winner. Instead recompute the
        # selected winners' t with full-precision scalar MT: any
        # exactly-admissible candidate's t upper-bounds the true best t,
        # so pruning against it is exact no matter which near-tied
        # triangle the relaxed sweep selected. One narrow hot-row gather
        # over the wave winners; relaxed modes + passes>=2 only.
        t1 = _exact_wave_ub_t(scene, p1, o, d, t_min, t_max)
    ub = jnp.max(t1.reshape(n_sub, G), axis=1)        # (n_sub,)
    ub_t = jnp.take(jnp.concatenate(
        [ub.reshape(n_tiles, SPT), jnp.zeros((1, SPT))]), tclamp, axis=0)
    fine2 = jnp.where(fine_w <= ub_t, fine_w, jnp.inf)
    block_cid, block_subs, total = group_cluster_major(
        tids, cids, fine2, SPT=SPT, SPB=SPB, n_sub=n_sub, B_cap=B_cap, K=K)
    return (block_cid, block_subs, tbl, total, coarse_total, k1, p1, tot1)


@partial(jax.jit, static_argnames=("TILE", "G", "SPB", "P_cap",
                                   "interpret", "waves"))
def _stage1_pruned(scene, o, d, t_min, t_max, *, TILE: int, G: int,
                   SPB: int, P_cap: int, interpret: bool, waves: int = 1):
    return _stage1_pruned_core(scene, o, d, t_min, t_max, TILE, G, SPB,
                               P_cap, interpret, waves)


@partial(jax.jit, static_argnames=("TILE", "G", "SPB", "P_cap", "nb",
                                   "interpret", "combine", "R0", "waves",
                                   "payload", "nb1"))
def _fused_query_pruned(scene, o, d, t_min, t_max, *, TILE: int, G: int,
                        SPB: int, P_cap: int, nb: int, interpret: bool,
                        combine: str, R0: int, waves: int,
                        payload: str = "full", nb1=None):
    """One-dispatch warm path for the ordered-wave (passes>=2) engine:
    wave stage1 + remainder sweep with a PREDICTED remainder grid, same
    predict-then-validate contract as _fused_query. The wave grid runs
    at the predicted nb1 (tot1 rides the totals readback as the 4th
    element; a miss falls back to the two-stage path)."""
    out = _stage1_pruned_core(scene, o, d, t_min, t_max, TILE, G, SPB,
                              P_cap, interpret, waves, nb1)
    block_cid, block_subs, tbl, total, coarse_total, k1, p1, tot1 = out
    res = _stage2_core(scene, block_cid, block_subs, tbl, o[:R0], d[:R0],
                       G, SPB, nb, interpret, combine, o.shape[0],
                       k1, p1, payload)
    csum = jnp.sum(res.t[::257], dtype=jnp.float32)
    return res, jnp.stack([total, coarse_total,
                           jax.lax.bitcast_convert_type(csum, jnp.int32),
                           tot1])


def _stage1_packed_core(scene, o, d, t_min, t_max, TILE, G, SPB_sub,
                        P_cap, Q_cap, interpret):
    """Stage1 for the packed sub-cluster sweep: phase A + refine at
    CLUSTER granularity (small K), compact the valid (subgroup, cluster)
    pairs, then refine the survivors against the SUBC sub-chunk AABBs —
    the expansion happens after compaction, so the grouping sort runs on
    ~valid*SUBC elements instead of P_cap*SPT*SUBC."""
    K = scene.n_clusters
    SUBC = scene.sub_chunks
    SPT = TILE // G
    R = o.shape[0]
    n_tiles = R // TILE
    n_sub = R // G

    entry = phase_a_entry(scene, o, d, t_min, t_max, n_tiles, TILE,
                          interpret)
    tids, cids, coarse_total = build_worklist(entry, P_cap)
    stats = subgroup_stats(o, d, t_min, t_max, G)
    fine = refine_pairs(stats, tids, cids, scene.cluster_min,
                        scene.cluster_max, SPT, n_tiles)       # (P, SPT)

    # Compact valid (subgroup, cluster) pairs to Q_cap.
    from .pallas_dense import compact_indices
    sub = (tids[:, None] * SPT
           + jnp.arange(SPT, dtype=jnp.int32)[None, :]).reshape(-1)
    cid = jnp.broadcast_to(cids[:, None], fine.shape).reshape(-1)
    valid = jnp.isfinite(fine).reshape(-1)
    sel, q_total = compact_indices(valid, Q_cap)
    qvalid = jnp.arange(Q_cap) < q_total
    qsub = jnp.where(qvalid, jnp.take(sub, sel), n_sub)
    qcid = jnp.where(qvalid, jnp.take(cid, sel), 0)

    # Sub-chunk refinement of the survivors (gathered per pair).
    sbmin, sbmax = subchunk_bounds(scene)                  # (K*SUBC, 3)
    st = jnp.take(jnp.concatenate(
        [stats, jnp.zeros((1, 14), jnp.float32)]),
        jnp.minimum(qsub, n_sub), axis=0)                  # (Q, 14)
    crow = qcid[:, None] * SUBC \
        + jnp.arange(SUBC, dtype=jnp.int32)[None, :]
    bmin = jnp.take(sbmin, crow.reshape(-1), axis=0).reshape(-1, SUBC, 3)
    bmax = jnp.take(sbmax, crow.reshape(-1), axis=0).reshape(-1, SUBC, 3)
    from .pallas_instanced import _bundle_entry_vs_bounds
    e2 = _bundle_entry_vs_bounds(
        st[:, None, 0:3], st[:, None, 3:6], st[:, None, 6:9],
        st[:, None, 9:12], st[:, None, 12], st[:, None, 13],
        bmin, bmax)                                        # (Q, SUBC)
    tvalid = qvalid[:, None] & jnp.isfinite(e2)

    B_cap = Q_cap * SUBC // SPB_sub + K * SUBC + 1
    sub_b = jnp.broadcast_to(qsub[:, None], tvalid.shape).reshape(-1)
    block_cid, block_subs, total = group_flat_cluster_major(
        sub_b, crow.reshape(-1), tvalid.reshape(-1), SPB=SPB_sub,
        n_sub=n_sub, B_cap=B_cap, K=K * SUBC)
    tbl = ray_table(o, d, t_min, t_max, G)
    totals = jnp.stack([coarse_total, q_total, total])
    return block_cid, block_subs, tbl, totals


@partial(jax.jit, static_argnames=("TILE", "G", "SPB_sub", "P_cap",
                                   "Q_cap", "interpret"))
def _stage1_packed(scene, o, d, t_min, t_max, *, TILE: int, G: int,
                   SPB_sub: int, P_cap: int, Q_cap: int, interpret: bool):
    return _stage1_packed_core(scene, o, d, t_min, t_max, TILE, G,
                               SPB_sub, P_cap, Q_cap, interpret)


def _stage2_packed_core(scene, block_cid, block_subs, tbl, o, d, G,
                        SPB_sub, PACKS, nb, R0, interpret):
    from ..accel.dense import finalize_hits_exact
    C_eff = scene.cluster_size // scene.sub_chunks
    n_sub = (tbl.shape[0] - 1)
    key, pair = run_packed(block_subs, block_cid, tbl, scene.tri_feats,
                           G=G, SPB_sub=SPB_sub, PACKS=PACKS, C_eff=C_eff,
                           SUBC=scene.sub_chunks, n_blocks=nb,
                           interpret=interpret)
    out_key, out_pair = combine_rows_grouped(
        key, pair, block_subs, nb, G, SPB_sub, n_sub)
    t = _t_from_keys(out_key[:R0], 0)
    return finalize_hits_exact(scene, out_pair[:R0], t, o, d)


@partial(jax.jit, static_argnames=("G", "SPB_sub", "PACKS", "nb", "R0",
                                   "interpret"))
def _stage2_packed(scene, block_cid, block_subs, tbl, o, d, *, G: int,
                   SPB_sub: int, PACKS: int, nb: int, R0: int,
                   interpret: bool):
    return _stage2_packed_core(scene, block_cid, block_subs, tbl, o, d, G,
                               SPB_sub, PACKS, nb, R0, interpret)


@partial(jax.jit, static_argnames=("TILE", "G", "SPB_sub", "PACKS",
                                   "P_cap", "Q_cap", "nb", "R0",
                                   "interpret"))
def _fused_query_packed(scene, o, d, t_min, t_max, *, TILE: int, G: int,
                        SPB_sub: int, PACKS: int, P_cap: int, Q_cap: int,
                        nb: int, R0: int, interpret: bool):
    """One-dispatch warm path for the packed engine (same contract as
    _fused_query): stage1 + stage2 with a PREDICTED block grid, totals
    validated post-hoc by the caller — results are only used when every
    capacity held, so exactness is unaffected. The packed totals
    readback carries a strided checksum of result.t as the honest
    completion barrier (tunneled backends: block_until_ready does not
    wait; see bench.py)."""
    block_cid, block_subs, tbl, totals = _stage1_packed_core(
        scene, o, d, t_min, t_max, TILE, G, SPB_sub, P_cap, Q_cap,
        interpret)
    res = _stage2_packed_core(scene, block_cid, block_subs, tbl, o[:R0],
                              d[:R0], G, SPB_sub, PACKS, nb, R0, interpret)
    csum = jnp.sum(res.t[::257], dtype=jnp.float32)
    return res, jnp.concatenate(
        [totals, jax.lax.bitcast_convert_type(csum, jnp.int32)[None]])


_PACKED_CACHE: dict = {}


def _packed_get(scene, ck):
    ent = _PACKED_CACHE.get(ck)
    if ent is not None:
        if ent.get("ref", lambda: None)() is scene.tri_feats:
            return ent
        del _PACKED_CACHE[ck]
        return None
    hint = _cap_store.load_hint(ck, scene)  # cross-process hint (validated)
    if hint is not None:
        import weakref as _wr
        try:
            hint["ref"] = _wr.ref(scene.tri_feats)
        except TypeError:
            hint["ref"] = lambda: None
        _PACKED_CACHE[ck] = hint
    return hint


def _packed_put(scene, ck, p, q, nb):
    import weakref as _wr
    _PACKED_CACHE[ck] = dict(p=p, q=q, nb=nb,
                             ref=_wr.ref(scene.tri_feats))
    _cap_store.save_hint(ck, _PACKED_CACHE[ck], scene)


def closest_hit_packed(scene, rays, *, tile: int = 2048, subgroup: int = 32,
                       spb_sub: int = 2, packs: int = 8,
                       pairs_per_tile: int = 48, with_checksum: bool = False,
                       deferred: bool = False):
    """Exact closest hit via the packed sub-cluster sweep (see the
    packed-engine comment block above). Requires a scene built with
    sub_chunks > 1 (sub-chunk-major tri_feats + sub_bounds); candidates
    are per-(G-ray subgroup, C/SUBC-triangle sub-cluster). Capacities
    auto-size from one packed totals readback with doubling retries —
    results are never truncated. Repeat queries at a cached (scene,
    shape) take a ONE-dispatch fused path with predicted capacities,
    validated post-hoc (falls back to the two-stage path on a miss).

    with_checksum=True returns (result, checksum): a HOST float strided
    sum of result.t riding the warm path's totals readback (None when
    the fused path was not taken) — the same honest completion barrier
    contract as closest_hit_regrouped."""
    SUBC = scene.sub_chunks
    # SUBC=1 is a legitimate configuration: candidates stay at cluster
    # granularity (C_eff = C) but blocks still pack PACKS sub-blocks of
    # SPB_sub subgroups block-diagonally along K — at 22 subscribers per
    # cluster (1M headline census), per-cluster padding drops from
    # ~31% at SPB=16 (regroup) to ~4% at SPB_sub=2.
    if packs * FEAT > 128:
        raise ValueError("packs*16 must be <= 128 (MXU depth)")
    interpret = jax.default_backend() != "tpu"
    batch = rays.batch_shape
    flat = lambda a: a.reshape((-1,) + a.shape[len(batch):])
    o, d = flat(rays.o), flat(rays.d)
    t_min, t_max = flat(rays.t_min), flat(rays.t_max)
    R0 = o.shape[0]
    G = min(subgroup, max(8, 1 << (max(R0, 1) - 1).bit_length()))
    TILE = min(tile, max(R0, G))
    TILE = -(-TILE // G) * G
    d = jnp.where(d == 0.0, 0.0, d)
    pad = (-R0) % TILE
    if pad:
        ext = lambda a, f: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], f, a.dtype)])
        o, d = ext(o, 0.0), ext(d, 1.0)
        t_min, t_max = ext(t_min, 0.0), ext(t_max, -jnp.inf)
    n_tiles = o.shape[0] // TILE
    n_sub = o.shape[0] // G
    K = scene.n_clusters
    hard_p = n_tiles * K
    hard_q = n_sub * K
    P_cap = min(pairs_per_tile * n_tiles, hard_p)
    Q_cap = min(max(4096, 8 * n_sub), hard_q)
    ck = (id(scene.tri_feats), scene.tri_feats.shape, o.shape[0], TILE, G,
          spb_sub, packs)
    cached = _packed_get(scene, ck)
    if cached is not None:
        P_cap = min(max(4096, -(-int(cached["p"] * 1.2) // 4096) * 4096),
                    hard_p)
        Q_cap = min(max(4096, -(-int(cached["q"] * 1.2) // 4096) * 4096),
                    hard_q)
    # The compacted pair list is drawn from the (P_cap, SPT) candidate
    # matrix — a Q_cap beyond its size is shape-invalid (small scenes).
    Q_cap = min(Q_cap, P_cap * (TILE // G))

    reshape_out = lambda res: jax.tree_util.tree_map(
        lambda a: a.reshape(batch + a.shape[1:]), res)

    if cached is not None and cached.get("nb", 0) >= packs:
        # Warm path: ONE dispatch with predicted capacities + block grid;
        # validate post-hoc, fall back on any miss.
        B_cap = Q_cap * SUBC // spb_sub + K * SUBC + 1
        nb_pred = min(cached["nb"], B_cap // packs * packs)
        if nb_pred >= packs:
            res, totals = _fused_query_packed(
                scene, o, d, t_min, t_max, TILE=TILE, G=G,
                SPB_sub=spb_sub, PACKS=packs, P_cap=P_cap, Q_cap=Q_cap,
                nb=nb_pred, R0=R0, interpret=interpret)
            import numpy as _np
            if deferred:
                def _finalize(res=res, totals=totals, ck=ck, P_cap=P_cap,
                              Q_cap=Q_cap, nb_pred=nb_pred, cached=cached):
                    tarr = _np.asarray(totals)
                    coarse, q_total, total = (int(x) for x in tarr[:3])
                    if coarse <= P_cap and q_total <= Q_cap \
                            and total <= nb_pred:
                        _packed_put(scene, ck,
                                    p=max(cached["p"], coarse),
                                    q=max(cached["q"], q_total),
                                    nb=max(cached["nb"], nb_pred))
                        return float(tarr[3:4].view(_np.float32)[0])
                    return None
                return reshape_out(res), _finalize
            tarr = _np.asarray(totals)
            coarse, q_total, total = (int(x) for x in tarr[:3])
            if coarse <= P_cap and q_total <= Q_cap and total <= nb_pred:
                # Sticky-max (see closest_hit_regrouped): shrinking
                # workloads must not move to smaller capacity buckets.
                _packed_put(scene, ck,
                            p=max(cached["p"], coarse),
                            q=max(cached["q"], q_total),
                            nb=max(cached["nb"], nb_pred))
                if with_checksum:
                    return reshape_out(res), float(
                        tarr[3:4].view(_np.float32)[0])
                return reshape_out(res)

    while True:
        block_cid, block_subs, tbl, totals = _stage1_packed(
            scene, o, d, t_min, t_max, TILE=TILE, G=G, SPB_sub=spb_sub,
            P_cap=P_cap, Q_cap=Q_cap, interpret=interpret)
        import numpy as _np
        coarse, q_total, total = (int(x) for x in _np.asarray(totals))
        ok_p = coarse <= P_cap
        ok_q = q_total <= Q_cap
        if ok_p and ok_q:
            break
        if P_cap >= hard_p and Q_cap >= hard_q:
            raise RuntimeError(
                f"packed worklist overflow at hard capacity: "
                f"coarse={coarse}/{P_cap} pairs={q_total}/{Q_cap}")
        if not ok_p:
            P_cap = min(2 * P_cap, hard_p)
        if not ok_q:
            Q_cap = min(2 * Q_cap, hard_q)
        Q_cap = min(Q_cap, P_cap * (TILE // G))
    nb = 1 << max(9, (max(total, 1) - 1).bit_length())
    nb = min(-(-nb // packs) * packs, block_cid.shape[0] // packs * packs)
    nb = max(nb, -(-total // packs) * packs)
    assert nb * 1 >= total and nb % packs == 0
    prev = cached or dict(p=0, q=0, nb=0)
    _packed_put(scene, ck, p=max(prev["p"], coarse),
                q=max(prev["q"], q_total),
                nb=max(prev.get("nb", 0), nb))
    res = _stage2_packed(scene, block_cid, block_subs, tbl, o[:R0],
                         d[:R0], G=G, SPB_sub=spb_sub, PACKS=packs,
                         nb=nb, R0=R0, interpret=interpret)
    if deferred:
        return reshape_out(res), None
    return (reshape_out(res), None) if with_checksum else reshape_out(res)


def _stage1_core(scene, o, d, t_min, t_max, TILE, G, SPB, P_cap, interpret):
    K = scene.n_clusters
    SPT = TILE // G
    R = o.shape[0]
    n_tiles = R // TILE
    n_sub = R // G
    B_cap = P_cap * SPT // SPB + K + 1

    entry = phase_a_entry(scene, o, d, t_min, t_max, n_tiles, TILE,
                          interpret)
    tids, cids, coarse_total = build_worklist(entry, P_cap)
    stats = subgroup_stats(o, d, t_min, t_max, G)
    fine = refine_pairs(stats, tids, cids, scene.cluster_min,
                        scene.cluster_max, SPT, n_tiles)
    block_cid, block_subs, total = group_cluster_major(
        tids, cids, fine, SPT=SPT, SPB=SPB, n_sub=n_sub, B_cap=B_cap, K=K)
    tbl = ray_table(o, d, t_min, t_max, G)
    return block_cid, block_subs, tbl, total, coarse_total


@partial(jax.jit, static_argnames=("TILE", "G", "SPB", "P_cap", "interpret"))
def _stage1(scene, o, d, t_min, t_max, *, TILE: int, G: int, SPB: int,
            P_cap: int, interpret: bool):
    """Phase A -> coarse worklist -> subgroup refine -> cluster-major
    grouping. Returns everything the sweep stage needs plus the runtime
    totals (coarse pairs, blocks) for host-side grid sizing."""
    return _stage1_core(scene, o, d, t_min, t_max, TILE, G, SPB, P_cap,
                        interpret)


def _stage1_cm_core(scene, o, d, t_min, t_max, TILE, G, SPB, P_cap, Q_cap,
                    interpret, waves: int = 0, nb1=None):
    """SORT-FREE stage1: compact the TRANSPOSED phase-A entry matrix so
    the coarse worklist comes out cluster-major for free; the subgroup
    expansion preserves that order, so after one compaction the blocks
    pack with pure rank arithmetic (pack_presorted_cluster_major) —
    replacing the N = P_cap*SPT two-key grouping sort (the largest
    stage1 term, docs/performance.md) with O(N) compaction + an O(Q_cap)
    pack. Candidate SET is identical to _stage1_core; only the block
    order differs (by cluster id instead of sort order), which the
    per-ray merge is insensitive to.

    waves=W>0 is the ordered-multiwave (passes=W+1) variant on this
    driver: each subgroup's W nearest candidate clusters (by the refined
    conservative entry) are swept in one statically-bounded grid, then
    the remaining compacted pairs are pruned against the per-subgroup
    best-t bound — the same exactness argument as _stage1_pruned_core.
    Two structural wins over the sort-path multiwave: (a) the W-round
    nearest selection runs on the COMPACTED (Q_cap,) pair list instead
    of the (P_cap, SPT) candidate matrix (~50x fewer elements per
    segment reduction), and (b) the remainder needs no grouping sort —
    pruning only DROPS elements from the cluster-major list, so a second
    order-preserving compaction + rank pack rebuilds the blocks.
    Returns (block_cid, block_subs, tbl, totals, k1, p1); k1/p1 are the
    wave sweep's per-ray merge inputs (None when waves=0)."""
    from .pallas_dense import compact_indices
    K = scene.n_clusters
    SPT = TILE // G
    R = o.shape[0]
    n_tiles = R // TILE
    n_sub = R // G

    entry = phase_a_entry(scene, o, d, t_min, t_max, n_tiles, TILE,
                          interpret)
    # build_worklist on entry.T: "tids" = rows = CLUSTER ids (dummy K),
    # "cids" = cols = TILE ids; compaction order = cluster-major.
    crow, tcol, coarse_total = build_worklist(entry.T, P_cap)
    valid_p = crow < K
    tile_ids = jnp.where(valid_p, tcol, n_tiles)
    cluster_ids = jnp.where(valid_p, crow, 0)
    stats = subgroup_stats(o, d, t_min, t_max, G)
    fine = refine_pairs(stats, tile_ids, cluster_ids, scene.cluster_min,
                        scene.cluster_max, SPT, n_tiles)       # (P, SPT)

    sub = (tile_ids[:, None] * SPT
           + jnp.arange(SPT, dtype=jnp.int32)[None, :]).reshape(-1)
    cid = jnp.broadcast_to(cluster_ids[:, None],
                           (P_cap, SPT)).reshape(-1)
    sel, q_total = compact_indices(jnp.isfinite(fine).reshape(-1), Q_cap)
    qvalid = jnp.arange(Q_cap) < q_total
    sub_q = jnp.where(qvalid, jnp.take(sub, sel), n_sub)
    cid_q = jnp.where(qvalid, jnp.take(cid, sel), K)
    B_cap = Q_cap // SPB + K + 1
    tbl = ray_table(o, d, t_min, t_max, G)

    if waves == 0:
        block_cid, block_subs, total = pack_presorted_cluster_major(
            cid_q, sub_q, qvalid, SPB=SPB, n_sub=n_sub, B_cap=B_cap, K=K)
        totals = jnp.stack([coarse_total, q_total, total])
        return block_cid, block_subs, tbl, totals, None, None

    # --- ordered waves on the compacted pair list ---
    entry_q = jnp.where(qvalid, jnp.take(fine.reshape(-1), sel), jnp.inf)
    BIG = jnp.float32(3e38)
    chosen_all = []
    ent_w = entry_q
    for _ in range(waves):
        e = jnp.where(jnp.isfinite(ent_w), ent_w, BIG)
        emin = jax.ops.segment_min(e, sub_q, num_segments=n_sub + 1)
        tied = jnp.isfinite(ent_w) & (e == jnp.take(emin, sub_q))
        csel = jax.ops.segment_min(jnp.where(tied, cid_q, K), sub_q,
                                   num_segments=n_sub + 1)
        chosen = csel[:n_sub]
        chosen_all.append(chosen)
        ch_full = jnp.concatenate([chosen, jnp.full((1,), K, jnp.int32)])
        ent_w = jnp.where(cid_q == jnp.take(ch_full, sub_q), jnp.inf,
                          ent_w)

    chf = jnp.stack(chosen_all, axis=1).reshape(-1)   # (n_sub * W,)
    subrep = jnp.repeat(jnp.arange(n_sub, dtype=jnp.int32), waves)
    B1 = n_sub * waves // SPB + K + 1
    bc1, bs1, tot1 = group_flat_cluster_major(
        subrep, jnp.minimum(chf, K - 1), chf < K,
        SPB=SPB, n_sub=n_sub, B_cap=B1, K=K)
    if nb1 is not None:
        # Predicted wave grid (warm fused path): the static worst-case
        # bound pads ~K no-op grid steps per sweep; slice to the
        # validated prediction instead (same contract as the remainder
        # grid's nb — tot1 rides the totals readback and a miss falls
        # back to the two-stage path).
        B1 = min(nb1, B1)
        bc1, bs1 = bc1[:B1], bs1[:B1]
    k1r, p1r = run_regrouped(bs1, bc1, tbl, scene.tri_feats, G=G, SPB=SPB,
                             C=scene.cluster_size, n_blocks=B1,
                             interpret=interpret,
                             tbl_mode=_tbl_mode_default(),
                             unroll=_unroll_default())
    k1, p1 = combine_rows_grouped(k1r, p1r, bs1, B1, G, SPB, n_sub)

    t1 = jnp.where(k1 == INT32_MAX, jnp.inf, _t_from_keys(k1, 0))
    from .pallas_dense import _MM_MODE
    if _MM_MODE:
        # Relaxed winner-selection precision: prune against an EXACT
        # upper bound recomputed from the wave winners (see
        # _stage1_pruned_core for the soundness argument).
        t1 = _exact_wave_ub_t(scene, p1, o, d, t_min, t_max)
    ub = jnp.max(t1.reshape(n_sub, G), axis=1)        # (n_sub,)
    ub_full = jnp.concatenate([ub, jnp.zeros((1,), ub.dtype)])
    # ent_w already carries inf at every swept (subgroup, cluster), so
    # the threshold alone excludes the wave set from the remainder; the
    # prune only DROPS entries, so cluster-major order is preserved and
    # an order-preserving compaction + rank pack rebuilds the blocks.
    keep = qvalid & (ent_w <= jnp.take(ub_full, sub_q))
    sel2, r_total = compact_indices(keep, Q_cap)
    rvalid = jnp.arange(Q_cap) < r_total
    sub_r = jnp.where(rvalid, jnp.take(sub_q, sel2), n_sub)
    cid_r = jnp.where(rvalid, jnp.take(cid_q, sel2), K)
    block_cid, block_subs, total = pack_presorted_cluster_major(
        cid_r, sub_r, rvalid, SPB=SPB, n_sub=n_sub, B_cap=B_cap, K=K)
    # 4-element totals for the multiwave driver: tot1 (true wave-grid
    # block count) validates the nb1 prediction. passes=1 totals stay
    # 3-element — its fused graphs (the headline path) are unchanged.
    totals = jnp.stack([coarse_total, q_total, total, tot1])
    return block_cid, block_subs, tbl, totals, k1, p1


@partial(jax.jit, static_argnames=("TILE", "G", "SPB", "P_cap", "Q_cap",
                                   "interpret", "waves"))
def _stage1_cm(scene, o, d, t_min, t_max, *, TILE: int, G: int, SPB: int,
               P_cap: int, Q_cap: int, interpret: bool, waves: int = 0):
    return _stage1_cm_core(scene, o, d, t_min, t_max, TILE, G, SPB,
                           P_cap, Q_cap, interpret, waves)


@partial(jax.jit, static_argnames=("TILE", "G", "SPB", "P_cap", "Q_cap",
                                   "nb", "interpret", "combine", "R0",
                                   "waves", "nb1"))
def _fused_query_cm(scene, o, d, t_min, t_max, *, TILE: int, G: int,
                    SPB: int, P_cap: int, Q_cap: int, nb: int,
                    interpret: bool, combine: str, R0: int,
                    waves: int = 0, nb1=None):
    """One-dispatch warm path for the sort-free stage1 (same predict-
    then-validate contract as _fused_query; totals carry coarse, q,
    blocks + a result checksum). waves>0 adds the ordered-wave sweep
    whose per-ray results merge into stage2; its grid runs at the
    predicted nb1 (validated via the 4th totals element)."""
    block_cid, block_subs, tbl, totals, k1, p1 = _stage1_cm_core(
        scene, o, d, t_min, t_max, TILE, G, SPB, P_cap, Q_cap, interpret,
        waves, nb1)
    res = _stage2_core(scene, block_cid, block_subs, tbl, o[:R0], d[:R0],
                       G, SPB, nb, interpret, combine, o.shape[0],
                       k1, p1)
    csum = jnp.sum(res.t[::257], dtype=jnp.float32)
    return res, jnp.concatenate(
        [totals, jax.lax.bitcast_convert_type(csum, jnp.int32)[None]])


@partial(jax.jit, static_argnames=("TILE", "G", "SPB", "P_cap", "nb",
                                   "interpret", "combine", "R0",
                                   "payload"))
def _fused_query(scene, o, d, t_min, t_max, *, TILE: int, G: int, SPB: int,
                 P_cap: int, nb: int, interpret: bool, combine: str,
                 R0: int, payload: str = "full"):
    """One-dispatch warm path: stage1 + stage2 with a PREDICTED block
    grid (from the call site's previous query). The caller validates the
    returned totals post-hoc and falls back to the two-stage path when
    the prediction was too small — results are only used when valid, so
    exactness is unaffected."""
    out = _stage1_core(scene, o, d, t_min, t_max, TILE, G, SPB, P_cap,
                       interpret)
    block_cid, block_subs, tbl, total, coarse_total = out
    res = _stage2_core(scene, block_cid, block_subs, tbl, o[:R0], d[:R0],
                       G, SPB, nb, interpret, combine, o.shape[0],
                       None, None, payload)
    # One packed totals array = one host readback for the validation.
    # A result checksum rides along in the same readback: a strided sum
    # over the result's t is value-dependent on the WHOLE query, so the
    # caller's totals pull doubles as an honest completion barrier
    # (tunneled backends: block_until_ready does not wait; see bench.py)
    # without a second probe dispatch + roundtrip.
    # Occlusion results carry t == 0 (constant — XLA would fold a t-sum
    # without running the query); sum the occluder ids instead.
    carrier = res.prim_idx.astype(jnp.float32) \
        if payload == "occlusion" else res.t
    csum = jnp.sum(carrier[::257], dtype=jnp.float32)
    return res, jnp.stack([total, coarse_total,
                           jax.lax.bitcast_convert_type(csum, jnp.int32)])


def _stage2_core(scene, block_cid, block_subs, tbl, o, d, G, SPB,
                 n_blocks, interpret, combine, R_pad, k1, p1,
                 payload: str = "full"):
    from ..accel.dense import finalize_hits_exact
    C = scene.cluster_size
    R = o.shape[0]
    n_sub = R_pad // G
    key, pair = run_regrouped(block_subs, block_cid, tbl, scene.tri_feats,
                              G=G, SPB=SPB, C=C, n_blocks=n_blocks,
                              interpret=interpret,
                              tbl_mode=_tbl_mode_default(),
                              unroll=_unroll_default())
    if combine == "grouped":
        out_key, out_pair = combine_rows_grouped(
            key, pair, block_subs, n_blocks, G, SPB, n_sub)
    else:
        row_ray = (block_subs[:n_blocks, :, None] * G
                   + jnp.arange(G, dtype=jnp.int32)).reshape(-1)
        out_key, out_pair = combine_rows(key, pair, row_ray, R_pad + G,
                                         method=combine)
        out_key, out_pair = out_key[:R_pad], out_pair[:R_pad]
    if k1 is not None:       # merge the pass-1 per-ray bests
        better1 = (k1 < out_key) | ((k1 == out_key) & (p1 >= 0)
                                    & ((p1 < out_pair) | (out_pair < 0)))
        out_key = jnp.where(better1, k1, out_key)
        out_pair = jnp.where(better1, p1, out_pair)
    if payload in ("occlusion", "slim"):
        # Occlusion contract (reference any_hit early-exit semantics,
        # src/instanced-bvh.jl:2034-2140): only hit + occluder prim +
        # instance are contractual — skip the payload finalize entirely
        # (the closest path's hot+cold gathers are the ~12-25 ms/1M-ray
        # term, docs/performance.md). The "slim" closest-hit variant
        # keeps the same skip but ALSO returns the true t (free — it is
        # the full-precision winning key) for consumers that never read
        # triangle/barycentric (view_factors, AO, collision probes).
        from ..accel.brute import HitResult
        from ..accel.dense import _hit_instance_idx
        from ..core.triangle import Triangle
        pair_r = out_pair[:R]
        hit = pair_r >= 0
        ids = jnp.take(scene.prims_hot[:, 10], jnp.clip(pair_r, 0, None))
        orig = jnp.where(hit, ids, -1)
        if payload == "slim":
            t = _t_from_keys(out_key[:R], 0)
            t = jnp.where(hit, t, 0.0)
            # metadata rides along (one narrow 4 B gather): view_factors
            # and illumination consume only hit/metadata — slim serves
            # them without the 160 B payload gather.
            meta = jnp.where(hit, jnp.take(
                scene.prims.metadata, jnp.clip(orig, 0, None), axis=0,
                mode="clip"), 0)
        else:
            t = jnp.zeros((R,), jnp.float32)
            meta = jnp.zeros((R,), scene.prims.metadata.dtype)
        z3 = jnp.zeros((R, 3, 3), jnp.float32)
        tri = Triangle(vertices=z3, normals=z3, tangents=z3,
                       uv=jnp.zeros((R, 3, 2), jnp.float32),
                       metadata=meta)
        return HitResult(hit=hit, triangle=tri, t=t,
                         barycentric=jnp.zeros((R, 3), jnp.float32),
                         prim_idx=orig,
                         instance_idx=_hit_instance_idx(scene, orig, hit))
    t = _t_from_keys(out_key[:R], 0)        # full-precision keys
    return finalize_hits_exact(scene, out_pair[:R], t, o, d)


@partial(jax.jit, static_argnames=("G", "SPB", "n_blocks", "interpret",
                                   "combine", "R_pad", "payload"))
def _stage2(scene, block_cid, block_subs, tbl, o, d, *, G: int, SPB: int,
            n_blocks: int, interpret: bool, combine: str, R_pad: int,
            k1=None, p1=None, payload: str = "full"):
    return _stage2_core(scene, block_cid, block_subs, tbl, o, d, G, SPB,
                        n_blocks, interpret, combine, R_pad, k1, p1,
                        payload)


# Per-(scene, query-shape) capacity memory: repeated queries (bench reps,
# render loops) right-size the coarse pair capacity from the previous
# call's true count, shrinking the grouping sort/scatter work ~3x vs the
# conservative first-call default. Overflow still retries with doubling.
# Entries carry a weakref to the keying array: ids are recycled after GC,
# so a recycled id must not inherit a dead scene's prediction (results
# would still be validated/correct, but the misprediction would trigger
# fallback recompiles). Size-bounded FIFO.
import weakref as _weakref

_CAPACITY_CACHE: dict = {}
_CAPACITY_CACHE_MAX = 64


def _cache_get(scene, ck):
    ent = _CAPACITY_CACHE.get(ck)
    if ent is None:
        # Fresh process / fresh scene: adopt a persisted hint from a
        # previous process at this (shape, params) key. Safe because
        # every prediction is validated post-hoc (capacity_store.py).
        hint = _cap_store.load_hint(ck, scene)
        if hint is not None:
            try:
                hint["ref"] = _weakref.ref(scene.tri_feats)
            except TypeError:
                hint["ref"] = None
            while len(_CAPACITY_CACHE) >= _CAPACITY_CACHE_MAX:
                _CAPACITY_CACHE.pop(next(iter(_CAPACITY_CACHE)))
            _CAPACITY_CACHE[ck] = hint
        return hint
    if ent.get("ref") is not None and ent["ref"]() is not scene.tri_feats:
        del _CAPACITY_CACHE[ck]         # stale: id was recycled
        return None
    return ent


def _cache_put(scene, ck, coarse, nb, nb1=None):
    try:
        ref = _weakref.ref(scene.tri_feats)
    except TypeError:
        ref = None
    while len(_CAPACITY_CACHE) >= _CAPACITY_CACHE_MAX:
        _CAPACITY_CACHE.pop(next(iter(_CAPACITY_CACHE)))
    ent = dict(coarse=coarse, nb=nb, ref=ref)
    if nb1 is not None:
        ent["nb1"] = nb1
    _CAPACITY_CACHE[ck] = ent
    _cap_store.save_hint(ck, _CAPACITY_CACHE[ck], scene)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (max(n, 1) - 1).bit_length())


def _shape_params(R0: int, tile: int, subgroup: int):
    """(G, TILE, padded R) exactly as closest_hit_regrouped/packed
    derive them — warm-capacity keys must match."""
    G = min(subgroup, max(8, 1 << (max(R0, 1) - 1).bit_length()))
    TILE = min(tile, max(R0, G))
    TILE = -(-TILE // G) * G
    return G, TILE, R0 + ((-R0) % TILE)


def auto_passes(scene) -> int:
    """passes="auto" resolution: depth-complex scenes (cluster AABBs
    forming >=~2 disjoint depth layers) take the ordered-wave multiwave
    path — 1.7-1.8x fewer swept candidates there; single sheets stay
    passes=1 where ordering structurally cannot pay (tools/wave_sim.py
    decision tables). Host-side cached statistic; no device work."""
    from ..accel.dense import depth_layers
    return 4 if depth_layers(scene) >= 1.6 else 1


def has_warm_capacity(scene, n_rays: int, *, tile: int = 2048,
                      subgroup: int = 32, spb: int = 16,
                      passes=1, occlusion: bool = False,
                      payload: str = "full") -> bool:
    """True when a previous regrouped query at this (scene, shape,
    params) has populated the capacity cache — i.e. the fused one-
    dispatch executables exist and a repeat query is cheap. dispatch
    uses this to auto-route big queries to the regrouped engine without
    risking a first-call multi-minute remote stage-graph compile."""
    if getattr(scene, "sub_chunks", 1) != 1:
        return False
    if passes == "auto":
        passes = auto_passes(scene)
    if occlusion:
        payload = "occlusion"
    G, TILE, Rp = _shape_params(n_rays, tile, subgroup)
    explicit_s1 = "RAYCORE_REGROUP_STAGE1" in _os.environ
    s1 = _os.environ.get("RAYCORE_REGROUP_STAGE1", "compact")
    if payload == "full" and s1 == "compact" \
            and (passes == 1 or explicit_s1):
        # A routed full-payload query will take the sort-free compact
        # driver (the measured passes=1 default; multiwave stays on
        # "sort" unless explicitly opted in — mirror
        # closest_hit_regrouped's routing), which capacity-caches under
        # its own "cm" key — warmth must be probed on the key the routed
        # query will actually use, else dispatch would either miss a
        # warm compact engine or route into a cold one.
        ck = (id(scene.tri_feats), scene.tri_feats.shape, Rp, TILE, G,
              spb, "cm") if passes == 1 else \
             (id(scene.tri_feats), scene.tri_feats.shape, Rp, TILE, G,
              spb, "cm", passes)
    else:
        ck = (id(scene.tri_feats), scene.tri_feats.shape, Rp, TILE, G,
              spb, passes, payload)
    return _cache_get(scene, ck) is not None


def has_warm_capacity_packed(scene, n_rays: int, *, tile: int = 2048,
                             subgroup: int = 32, spb_sub: int = 2,
                             packs: int = 8) -> bool:
    """Packed-engine analogue of has_warm_capacity. SUBC=1 scenes are
    legitimate here (cluster-granularity candidates, block-diagonal
    K-packing — see closest_hit_packed); warmth is purely a cache fact."""
    G, TILE, Rp = _shape_params(n_rays, tile, subgroup)
    ck = (id(scene.tri_feats), scene.tri_feats.shape, Rp, TILE, G,
          spb_sub, packs)
    return _packed_get(scene, ck) is not None


def prewarm(scene, n_rays: int, *, engine: str = "auto", tile: int = 2048,
            subgroup: int = 32, spb: int = 16, spb_sub: int = 2,
            packs: int = 8, passes="auto"):
    """Compile + capacity-size the fast sweep engines for (scene,
    n_rays)-shaped queries. Runs two throwaway coherent queries (the
    first sizes capacities and compiles the two-stage path, the second
    compiles + validates the fused one-dispatch path). After this,
    dispatch auto-routes matching queries to the warmed engine — the
    opt-in that makes the fastest engine the product default without
    exposing renderer pipelines to multi-minute first-frame compiles on
    remote-compiler backends (VERDICT r2 item 4).

    engine: "regroup" (sub_chunks=1 scenes), "packed" (sub_chunks>=2),
    or "auto" (pick by scene form). Returns seconds spent."""
    import time as _time
    from ..core.ray import Ray as _Ray
    if engine == "auto":
        engine = "packed" if getattr(scene, "sub_chunks", 1) >= 2 \
            else "regroup"
    if passes == "auto":
        passes = auto_passes(scene)
    t0 = _time.time()
    # Coherent primary-style grid over the scene's top face, looking
    # down: candidate counts are workload-dependent, so the capacity
    # cache validates post-hoc and falls back gracefully if a real
    # query needs more (sticky-max growth, no correctness impact).
    lo = scene.root_aabb[0]
    hi = scene.root_aabb[1]
    side = max(int(n_rays ** 0.5), 1)
    R0 = n_rays
    xs = jnp.linspace(lo[0], hi[0], side)
    ys = jnp.linspace(lo[1], hi[1], side)
    X, Y = jnp.meshgrid(xs, ys, indexing="ij")
    o = jnp.stack([X, Y, jnp.full_like(X, hi[2] + 1.0)], -1).reshape(-1, 3)
    reps = -(-R0 // o.shape[0])
    o = jnp.tile(o, (reps, 1))[:R0]
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32),
                         o.shape)
    rays = _Ray.create(o=o, d=d)
    for _ in range(2):
        if engine == "packed":
            closest_hit_packed(scene, rays, tile=tile, subgroup=subgroup,
                               spb_sub=spb_sub, packs=packs)
        else:
            closest_hit_regrouped(scene, rays, tile=tile,
                                  subgroup=subgroup, spb=spb,
                                  passes=passes)
            any_hit_regrouped(scene, rays, tile=tile, subgroup=subgroup,
                              spb=spb)
    return _time.time() - t0


def _closest_hit_regrouped_cm(scene, rays, *, tile: int, subgroup: int,
                              spb: int, pairs_per_tile: int, combine: str,
                              with_checksum: bool, deferred: bool = False,
                              passes: int = 1):
    """Sort-free stage1 driver (stage1="compact"): same auto-sizing
    contract as closest_hit_regrouped with one extra capacity (Q_cap,
    the compacted subgroup-pair list) validated from the same packed
    totals readback. passes=N>=2 runs the ordered multiwave on this
    driver (waves selected on the compacted pair list — see
    _stage1_cm_core)."""
    waves = passes - 1
    interpret = jax.default_backend() != "tpu"
    batch = rays.batch_shape
    flat = lambda a: a.reshape((-1,) + a.shape[len(batch):])
    o, d = flat(rays.o), flat(rays.d)
    t_min, t_max = flat(rays.t_min), flat(rays.t_max)
    R0 = o.shape[0]
    G = min(subgroup, max(8, 1 << (max(R0, 1) - 1).bit_length()))
    TILE = min(tile, max(R0, G))
    TILE = -(-TILE // G) * G
    SPB = spb
    d = jnp.where(d == 0.0, 0.0, d)
    pad = (-R0) % TILE
    if pad:
        ext = lambda a, f: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], f, a.dtype)])
        o, d = ext(o, 0.0), ext(d, 1.0)
        t_min, t_max = ext(t_min, 0.0), ext(t_max, -jnp.inf)
    n_tiles = o.shape[0] // TILE
    n_sub = o.shape[0] // G
    SPT = TILE // G
    K = scene.n_clusters
    hard_p = n_tiles * K
    hard_q = n_sub * K
    P_cap = min(pairs_per_tile * n_tiles, hard_p)
    Q_cap = min(max(4096, 8 * n_sub), hard_q)
    # passes=1 keeps the original "cm" key (persisted hints stay valid);
    # multiwave capacities live under their own key — the remainder
    # block count differs from the unpruned one.
    ck = (id(scene.tri_feats), scene.tri_feats.shape, o.shape[0], TILE, G,
          SPB, "cm") if passes == 1 else \
         (id(scene.tri_feats), scene.tri_feats.shape, o.shape[0], TILE, G,
          SPB, "cm", passes)
    cached = _cache_get(scene, ck)
    if cached is not None:
        bucket = lambda w, h: min(max(4096, -(-int(w * 1.2) // 4096) * 4096),
                                  h)
        P_cap = bucket(cached["coarse"], hard_p)
        Q_cap = bucket(cached["q"], hard_q)
    # The compacted pair list is drawn from the (P_cap, SPT) candidate
    # matrix — a Q_cap beyond its size is shape-invalid (small scenes).
    Q_cap = min(Q_cap, P_cap * SPT)

    reshape_out = lambda res: jax.tree_util.tree_map(
        lambda a: a.reshape(batch + a.shape[1:]), res)
    import numpy as _np

    # Same fused-graph size gate as the sort driver: the one-dispatch
    # executable's XLA compile is superlinear in K (tools/
    # probe_4m_compile.py); above the threshold stay two-stage.
    fuse_max_k = int(_os.environ.get("RAYCORE_FUSE_MAX_K", "16384"))
    # Static worst-case wave-grid bound (multiwave only): the warm path
    # runs the wave sweep at a predicted nb1 instead (validated via the
    # 4th totals element), saving ~K no-op grid steps per query.
    n_sub_pad = o.shape[0] // G
    B1_full = n_sub_pad * waves // SPB + K + 1 if waves else 0
    if cached is not None and combine == "grouped" and K <= fuse_max_k:
        B_cap = Q_cap // SPB + K + 1
        nb_pred = min(cached["nb"], B_cap)
        nb1_pred = min(cached.get("nb1", B1_full), B1_full) if waves \
            else None
        res, totals = _fused_query_cm(
            scene, o, d, t_min, t_max, TILE=TILE, G=G, SPB=SPB,
            P_cap=P_cap, Q_cap=Q_cap, nb=nb_pred, interpret=interpret,
            combine=combine, R0=R0, waves=waves, nb1=nb1_pred)

        def _validate(tarr, sync_cache=True):
            # Shared fused-path validation: 3-element totals (+checksum)
            # for passes=1, 4-element for multiwave (tot1 validates the
            # wave-grid prediction). Returns the checksum or None.
            coarse, q_total, total = (int(x) for x in tarr[:3])
            ok = coarse <= P_cap and q_total <= Q_cap and total <= nb_pred
            ent = dict(coarse=max(cached["coarse"], coarse),
                       q=max(cached["q"], q_total),
                       nb=max(cached["nb"], nb_pred))
            ci = 3
            if waves:
                tot1 = int(tarr[3])
                ok = ok and tot1 <= nb1_pred
                ent["nb1"] = max(cached.get("nb1", 0),
                                 min(max(512, _next_pow2(tot1)), B1_full))
                ci = 4
            if not ok:
                return None
            if sync_cache:
                _cache_put_cm(scene, ck, **ent)
            return float(tarr[ci:ci + 1].view(_np.float32)[0])

        if deferred:
            def _finalize(res=res, totals=totals):
                return _validate(_np.asarray(totals))
            return reshape_out(res), _finalize
        cs = _validate(_np.asarray(totals))
        if cs is not None:
            if with_checksum:
                return reshape_out(res), cs
            return reshape_out(res)

    while True:
        block_cid, block_subs, tbl, totals, k1, p1 = _stage1_cm(
            scene, o, d, t_min, t_max, TILE=TILE, G=G, SPB=SPB,
            P_cap=P_cap, Q_cap=Q_cap, interpret=interpret, waves=waves)
        tarr = _np.asarray(totals)
        coarse, q_total, total = (int(x) for x in tarr[:3])
        tot1 = int(tarr[3]) if waves else 0
        ok_p, ok_q = coarse <= P_cap, q_total <= Q_cap
        if ok_p and ok_q:
            break
        if P_cap >= hard_p and Q_cap >= hard_q:
            raise RuntimeError(
                f"regroup-cm worklist overflow at hard capacity: "
                f"coarse={coarse}/{P_cap} pairs={q_total}/{Q_cap}")
        if not ok_p:
            P_cap = min(2 * P_cap, hard_p)
        if not ok_q:
            Q_cap = min(2 * Q_cap, hard_q)
        Q_cap = min(Q_cap, P_cap * (TILE // G))
    nb = 1 << max(9, (max(total, 1) - 1).bit_length())
    nb = min(nb, block_cid.shape[0])
    prev = cached or dict(coarse=0, q=0, nb=0)
    kw = dict(coarse=max(prev["coarse"], coarse),
              q=max(prev["q"], q_total), nb=max(prev["nb"], nb))
    if waves:
        kw["nb1"] = max(prev.get("nb1", 0),
                        min(max(512, _next_pow2(tot1)), B1_full))
    _cache_put_cm(scene, ck, **kw)
    res = _stage2(scene, block_cid, block_subs, tbl, o[:R0], d[:R0],
                  G=G, SPB=SPB, n_blocks=nb, interpret=interpret,
                  combine=combine, R_pad=o.shape[0], k1=k1, p1=p1)
    res = reshape_out(res)
    if deferred:
        return res, None
    return (res, None) if with_checksum else res


def _cache_put_cm(scene, ck, coarse, q, nb, nb1=None):
    try:
        ref = _weakref.ref(scene.tri_feats)
    except TypeError:
        ref = None
    while len(_CAPACITY_CACHE) >= _CAPACITY_CACHE_MAX:
        _CAPACITY_CACHE.pop(next(iter(_CAPACITY_CACHE)))
    ent = dict(coarse=coarse, q=q, nb=nb, ref=ref)
    if nb1 is not None:
        ent["nb1"] = nb1
    _CAPACITY_CACHE[ck] = ent
    _cap_store.save_hint(ck, _CAPACITY_CACHE[ck], scene)


def closest_hit_regrouped(scene, rays, *, tile: int = 512, subgroup: int = 32,
                          spb: int = 16, pairs_per_tile: int = 48,
                          combine: str = "grouped", passes: int = 2,
                          with_checksum: bool = False,
                          stage1: str | None = None,
                          deferred: bool = False,
                          payload: str = "full",
                          _occlusion: bool = False):
    """Exact closest hit via the cluster-major regrouped sweep. One host
    sync reads the true block count and pow2-buckets the kernel grid
    (same auto-sizing contract as closest_hit_dense_pallas_auto).
    passes=N>=2 sweeps each subgroup's N-1 NEAREST clusters first (one
    ordered-wave grid) and prunes the rest against the resulting
    per-subgroup best-t bound (conservative, so still exact); passes=1
    sweeps every refined candidate. On depth-complex scenes passes=4
    sweeps ~1.8x fewer triangles than passes=1 (tools/wave_sim.py);
    on single-layer scenes (heightfield) ordering cannot pay — keep
    passes=1 there.

    with_checksum=True returns (result, checksum) where checksum is a
    HOST float strided-sum of result.t (None when the warm fused path
    was not taken). Reading it costs nothing extra — it rides the warm
    path's existing totals readback — and it is value-dependent on the
    full query, so benchmarks can use it as the honest completion
    barrier instead of dispatching a separate probe.

    stage1: "compact" (the passes=1 default since the round-5 device A/B
    measured it 8.39 vs 7.59 Mrays/s at the 1M headline; env
    RAYCORE_REGROUP_STAGE1 overrides) compacts the transposed phase-A
    matrix so blocks pack sort-free; "sort" uses the two-key grouping
    sort — same candidate set, different block order. The multiwave
    (passes>=2) DEFAULTS to "sort": its compact variant exists
    (stage1="compact" opts in) but measured slower on device (blobby
    passes=4: 228 vs 182 ms — unsorted-scatter wave selection + larger
    compactions; docs/evidence/r5a). Non-full payloads always use
    "sort" (the compact driver returns the full payload only).

    payload: "full" (default) gathers the winning triangle and returns
    the exact (t, barycentric, triangle) payload; "slim" returns the
    same exact hit/t/prim_idx/instance_idx but ZERO triangle/barycentric
    — skipping the 160 B/ray payload gather + scalar recompute for
    consumers that never read them (view_factors, AO, collision
    probes); "occlusion" is any_hit_regrouped's internal mode."""
    if scene.sub_chunks != 1:
        raise ValueError("regrouped engine requires sub_chunks=1 scenes")
    if passes == "auto":
        passes = auto_passes(scene)
    if _occlusion:
        payload = "occlusion"
    if payload not in ("full", "slim", "occlusion"):
        raise ValueError(f"payload must be 'full', 'slim' or 'occlusion',"
                         f" got {payload}")
    explicit_s1 = stage1 is not None \
        or "RAYCORE_REGROUP_STAGE1" in _os.environ
    if stage1 is None:
        stage1 = _os.environ.get("RAYCORE_REGROUP_STAGE1", "compact")
    if stage1 not in ("sort", "compact"):
        raise ValueError(f"stage1 must be 'sort' or 'compact', got {stage1}")
    # Default routing follows the device A/Bs: compact for passes=1
    # (8.39 vs 7.59 Mrays/s at the 1M headline), SORT for the multiwave
    # (blobby passes=4: sort 182 ms vs compact 228 — the compact
    # driver's unsorted-scatter wave selection and larger compactions
    # lose on depth-complex pair lists; docs/evidence/r5a). An explicit
    # stage1="compact" (arg or env) still opts the multiwave into the
    # cm driver for experiments.
    if stage1 == "compact" and payload == "full" \
            and (passes == 1 or explicit_s1):
        return _closest_hit_regrouped_cm(
            scene, rays, tile=tile, subgroup=subgroup, spb=spb,
            pairs_per_tile=pairs_per_tile, combine=combine,
            with_checksum=with_checksum, deferred=deferred, passes=passes)
    interpret = jax.default_backend() != "tpu"
    batch = rays.batch_shape
    flat = lambda a: a.reshape((-1,) + a.shape[len(batch):])
    o, d = flat(rays.o), flat(rays.d)
    t_min, t_max = flat(rays.t_min), flat(rays.t_max)
    R0 = o.shape[0]
    G = min(subgroup, max(8, 1 << (max(R0, 1) - 1).bit_length()))
    # TILE must be a multiple of G (subgroup_stats / ray_table reshape
    # (n_sub, G)); round up so e.g. R0=100, G=32 pads to TILE=128.
    TILE = min(tile, max(R0, G))
    TILE = -(-TILE // G) * G
    SPB = spb
    d = jnp.where(d == 0.0, 0.0, d)
    pad = (-R0) % TILE
    if pad:
        ext = lambda a, f: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], f, a.dtype)])
        o, d = ext(o, 0.0), ext(d, 1.0)
        t_min, t_max = ext(t_min, 0.0), ext(t_max, -jnp.inf)
    n_tiles = o.shape[0] // TILE
    hard = n_tiles * scene.n_clusters
    P_cap = min(pairs_per_tile * n_tiles, hard)
    ck = (id(scene.tri_feats), scene.tri_feats.shape, o.shape[0], TILE, G,
          SPB, passes, payload)
    cached = _cache_get(scene, ck)
    if cached is not None:
        # 4096-multiple buckets: tight enough to shrink the grouping N,
        # coarse enough to bound recompiles.
        want = int(cached["coarse"] * 1.2)
        P_cap = min(max(4096, -(-want // 4096) * 4096), hard)

    reshape_out = lambda res: jax.tree_util.tree_map(
        lambda a: a.reshape(batch + a.shape[1:]), res)

    # Fused-graph size gate: the one-dispatch warm executable's XLA
    # compile scales SUPERLINEARLY with cluster count (measured CPU
    # compile: _fused_query_pruned 55 s at K=8192 -> 350 s at K=32768
    # while its two-stage pieces stay ~146 s — tools/probe_4m_compile.py;
    # through the ~8x-slower remote compiler the fused 4M graph is the
    # round-4 30-min-timebox blowup). Above the threshold the engine
    # stays on the two-stage path: same results, one extra dispatch
    # (~15% tunnel tax), compile cost bounded. Large scenes can instead
    # build with cluster_size=512 to keep K at the fuse-friendly 8192.
    fuse_max_k = int(_os.environ.get("RAYCORE_FUSE_MAX_K", "16384"))
    if cached is not None and combine == "grouped" \
            and scene.n_clusters <= fuse_max_k \
            and not (passes > 1 and payload == "occlusion"):
        # Warm path: ONE dispatch with the predicted block grid; validate
        # the totals afterwards and fall back when the prediction missed.
        B_cap = P_cap * (TILE // G) // SPB + scene.n_clusters + 1
        nb_pred = min(cached["nb"], B_cap)
        n_sub_pad = o.shape[0] // G
        B1_full = n_sub_pad * (passes - 1) // SPB + scene.n_clusters + 1 \
            if passes > 1 else 0
        nb1_pred = min(cached.get("nb1", B1_full), B1_full) \
            if passes > 1 else None
        if passes == 1:
            res, totals = _fused_query(
                scene, o, d, t_min, t_max, TILE=TILE, G=G, SPB=SPB,
                P_cap=P_cap, nb=nb_pred, interpret=interpret,
                combine=combine, R0=R0, payload=payload)
        else:
            res, totals = _fused_query_pruned(
                scene, o, d, t_min, t_max, TILE=TILE, G=G, SPB=SPB,
                P_cap=P_cap, nb=nb_pred, interpret=interpret,
                combine=combine, R0=R0, waves=passes - 1,
                payload=payload, nb1=nb1_pred)
        import numpy as _np

        def _validate(tarr):
            # Totals: [blocks, coarse, checksum] (+ tot1 for multiwave —
            # validates the wave-grid prediction). Returns the checksum
            # or None on any capacity miss.
            it, ic = int(tarr[0]), int(tarr[1])
            ok = ic <= P_cap and it <= nb_pred
            ent = dict(coarse=max(cached["coarse"], ic),
                       nb=max(cached["nb"], max(512, _next_pow2(it))))
            if passes > 1:
                tot1 = int(tarr[3])
                ok = ok and tot1 <= nb1_pred
                ent["nb1"] = max(cached.get("nb1", 0),
                                 min(max(512, _next_pow2(tot1)), B1_full))
            if not ok:
                return None
            _cache_put(scene, ck, **ent)
            return float(tarr[2:3].view(_np.float32)[0])

        if deferred:
            # Pipelined-dispatch mode: hand back the UNSYNCED result plus
            # a finalizer that does the usual totals validation later.
            # The finalizer returns the checksum, or None when a capacity
            # prediction missed (the result must then be DISCARDED and
            # the query re-issued non-deferred). For identical repeated
            # queries (bench reps, fixed camera) the totals are
            # deterministic, so one validated call validates them all.
            def _finalize(res=res, totals=totals):
                return _validate(_np.asarray(totals))
            return reshape_out(res), _finalize
        # Sticky-max all counts: shrinking workloads (e.g. later
        # path-tracer bounces) must NOT move to smaller capacity
        # buckets — every new bucket is a multi-minute remote
        # compile on the tunneled backend.
        cs = _validate(_np.asarray(totals))
        if cs is not None:
            if with_checksum:
                return reshape_out(res), cs
            return reshape_out(res)

    k1 = p1 = None
    while True:
        # Retry with doubled capacity until the coarse pair count fits.
        # Terminates: coarse <= hard (= n_tiles * K) by construction, and
        # P_cap reaches hard after finitely many doublings — a truncated
        # worklist is never swept (that would silently drop candidates
        # from an API documented as exact).
        if passes >= 2:
            out = _stage1_pruned(scene, o, d, t_min, t_max, TILE=TILE,
                                 G=G, SPB=SPB, P_cap=P_cap,
                                 interpret=interpret, waves=passes - 1)
            block_cid, block_subs, tbl, total, coarse, k1, p1, tot1 = out
        else:
            block_cid, block_subs, tbl, total, coarse = _stage1(
                scene, o, d, t_min, t_max, TILE=TILE, G=G, SPB=SPB,
                P_cap=P_cap, interpret=interpret)
        if int(coarse) <= P_cap:
            break
        if P_cap >= hard:
            raise RuntimeError(
                f"regroup worklist overflow at hard capacity: "
                f"{int(coarse)} coarse pairs > {P_cap}")
        P_cap = min(2 * P_cap, hard)
    nb = int(total)                         # the one host sync
    nb = 1 << max(9, (max(nb, 1) - 1).bit_length())
    nb = min(nb, block_cid.shape[0])
    prev = _cache_get(scene, ck) or dict(coarse=0, nb=0)
    kw = dict(coarse=max(prev["coarse"], int(coarse)),
              nb=max(prev["nb"], nb))
    if passes >= 2:
        n_sub_pad = o.shape[0] // G
        B1_full = n_sub_pad * (passes - 1) // SPB + scene.n_clusters + 1
        kw["nb1"] = max(prev.get("nb1", 0),
                        min(max(512, _next_pow2(int(tot1))), B1_full))
    _cache_put(scene, ck, **kw)
    res = _stage2(scene, block_cid, block_subs, tbl, o[:R0], d[:R0],
                  G=G, SPB=SPB, n_blocks=nb, interpret=interpret,
                  combine=combine, R_pad=o.shape[0], k1=k1, p1=p1,
                  payload=payload)
    res = jax.tree_util.tree_map(
        lambda a: a.reshape(batch + a.shape[1:]), res)
    if deferred:
        return res, None        # cold path already synced; no finalizer
    return (res, None) if with_checksum else res


def any_hit_regrouped(scene, rays, *, tile: int = 2048, subgroup: int = 32,
                      spb: int = 16, pairs_per_tile: int = 48,
                      with_checksum: bool = False, deferred: bool = False):
    """Occlusion over a DenseScene via the regrouped sweep: same
    candidate culling and MXU sweep as closest_hit_regrouped with t_min
    forced to 0 (reference any_hit, src/instanced-bvh.jl:2045), but only
    (hit, occluder prim, instance) are contractual — t/bary/triangle are
    zeros and the payload finalize is skipped entirely."""
    rays0 = rays.replace(t_min=jnp.zeros_like(rays.t_min))
    return closest_hit_regrouped(
        scene, rays0, tile=tile, subgroup=subgroup, spb=spb,
        pairs_per_tile=pairs_per_tile, combine="grouped", passes=1,
        with_checksum=with_checksum, stage1="sort", deferred=deferred,
        _occlusion=True)
