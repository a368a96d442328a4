"""Pallas TPU kernel: dense Möller–Trumbore sweep for small meshes.

For meshes up to ~64K triangles, a fully dense rays x triangles sweep with
the whole triangle table resident in VMEM beats stack traversal: zero
gathers, zero divergence, pure VPU arithmetic. This is the Pallas analogue
of the reference's "GPU ray tracing tutorial" tiled kernels
(reference: docs/src/gpu_raytracing_tutorial.md — its 32x16 tiling
experiments), re-tiled for the 8x128 VPU.

Grid: one program per ray tile; the kernel loops over triangle blocks with
`lax.fori_loop`, carrying per-ray (best_t, best_idx, u, v).

Exact hit semantics of `fast_intersect_triangle` (the BVH hot-loop test),
so results interchange with the traversal paths.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.ray import Ray
from .pallas_dense import _VMEM_PARAMS
from ..core.triangle import Triangle
from .. import accel

RAY_TILE = 256
TRI_BLOCK = 512


def _kernel(tri_ref, o_ref, d_ref, tmin_ref, tmax_ref,
            t_out, idx_out, u_out, v_out, *, n_blocks: int, block: int):
    ox = o_ref[:, 0:1]
    oy = o_ref[:, 1:2]
    oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz = d_ref[:, 2:3]
    t_min = tmin_ref[:, 0:1]
    t_max = tmax_ref[:, 0:1]

    R = ox.shape[0]
    init = (jnp.full((R, 1), jnp.inf, jnp.float32),
            jnp.full((R, 1), -1, jnp.int32),
            jnp.zeros((R, 1), jnp.float32),
            jnp.zeros((R, 1), jnp.float32))

    def body(bi, carry):
        best_t, best_i, best_u, best_v = carry
        blk = tri_ref[:, pl.ds(bi * block, block)]      # (9, B)
        v0x, v0y, v0z = blk[0:1], blk[1:2], blk[2:3]    # (1, B)
        v1x, v1y, v1z = blk[3:4], blk[4:5], blk[5:6]
        v2x, v2y, v2z = blk[6:7], blk[7:8], blk[8:9]

        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z

        # s1 = d x e2  -> (R, B) per component.
        s1x = dy * e2z - dz * e2y
        s1y = dz * e2x - dx * e2z
        s1z = dx * e2y - dy * e2x
        det = s1x * e1x + s1y * e1y + s1z * e1z
        invd = 1.0 / det

        px = ox - v0x
        py = oy - v0y
        pz = oz - v0z
        u = (px * s1x + py * s1y + pz * s1z) * invd

        # s2 = p x e1.
        s2x = py * e1z - pz * e1y
        s2y = pz * e1x - px * e1z
        s2z = px * e1y - py * e1x
        v = (dx * s2x + dy * s2y + dz * s2z) * invd
        t = (e2x * s2x + e2y * s2y + e2z * s2z) * invd

        hit = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) \
            & (t >= t_min) & (t <= t_max) & (t < best_t)
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1) + bi * block

        # Argmin within the block, then merge with the running best.
        t_blk = jnp.where(hit, t, jnp.inf)
        blk_min = jnp.min(t_blk, axis=1, keepdims=True)
        is_min = (t_blk == blk_min) & (blk_min < jnp.inf)
        # Lowest index among ties (deterministic like the XLA argmin).
        big = jnp.int32(2 ** 30)
        blk_idx = jnp.min(jnp.where(is_min, ids, big), axis=1, keepdims=True)
        first = is_min & (ids == blk_idx)
        blk_u = jnp.max(jnp.where(first, u, -jnp.inf), axis=1, keepdims=True)
        blk_v = jnp.max(jnp.where(first, v, -jnp.inf), axis=1, keepdims=True)

        better = blk_min < best_t
        return (jnp.where(better, blk_min, best_t),
                jnp.where(better, blk_idx, best_i),
                jnp.where(better, blk_u, best_u),
                jnp.where(better, blk_v, best_v))

    best_t, best_i, best_u, best_v = jax.lax.fori_loop(
        0, n_blocks, body, init)
    miss = best_i < 0
    t_out[:, 0] = jnp.where(miss, 0.0, best_t)[:, 0]
    idx_out[:, 0] = best_i[:, 0]
    u_out[:, 0] = jnp.where(miss, 0.0, best_u)[:, 0]
    v_out[:, 0] = jnp.where(miss, 0.0, best_v)[:, 0]


def _pad_to(a, n, fill):
    if a.shape[0] == n:
        return a
    return jnp.concatenate(
        [a, jnp.full((n - a.shape[0],) + a.shape[1:], fill, a.dtype)])


@partial(jax.jit, static_argnames=("interpret",))
def _run(tri_table, o, d, t_min, t_max, *, interpret=False):
    T = tri_table.shape[1]
    R = o.shape[0]
    n_blocks = T // TRI_BLOCK
    grid = (R // RAY_TILE,)
    kernel = partial(_kernel, n_blocks=n_blocks, block=TRI_BLOCK)
    spec_r = lambda w: pl.BlockSpec((RAY_TILE, w), lambda i: (i, 0),
                                    memory_space=pltpu.ANY if False else pltpu.VMEM)
    out_spec = pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    shapes = [jax.ShapeDtypeStruct((R, 1), jnp.float32),
              jax.ShapeDtypeStruct((R, 1), jnp.int32),
              jax.ShapeDtypeStruct((R, 1), jnp.float32),
              jax.ShapeDtypeStruct((R, 1), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            spec_r(3), spec_r(3), spec_r(1), spec_r(1),
        ],
        out_specs=[out_spec] * 4,
        out_shape=shapes,
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(tri_table, o, d, t_min, t_max)


def make_tri_table(tris: Triangle):
    """(9, T) f32 component-major triangle table, T padded to TRI_BLOCK.
    Padding triangles are degenerate (zeros) => guaranteed miss."""
    v = tris.vertices
    T = v.shape[0]
    Tp = -(-T // TRI_BLOCK) * TRI_BLOCK
    flat = jnp.concatenate([v[:, 0], v[:, 1], v[:, 2]], axis=1)   # (T, 9)
    flat = _pad_to(flat, Tp, 0.0)
    return flat.T.copy()                                          # (9, Tp)


def closest_hit_brute_pallas(tris: Triangle, rays: Ray, *,
                             tri_table=None, interpret=None):
    """Pallas dense closest-hit; same HitResult contract as the other
    paths. Precompute ``tri_table=make_tri_table(tris)`` to amortize."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tri_table is None:
        tri_table = make_tri_table(tris)
    batch = rays.batch_shape
    flat = lambda a: a.reshape((-1,) + a.shape[len(batch):])
    o = flat(rays.o)
    d = flat(rays.d)
    R = o.shape[0]
    Rp = -(-R // RAY_TILE) * RAY_TILE
    o = _pad_to(o, Rp, 0.0)
    d = _pad_to(d, Rp, 1.0)
    t_min = _pad_to(flat(rays.t_min)[:, None], Rp, 0.0)
    t_max = _pad_to(flat(rays.t_max)[:, None], Rp, -1.0)

    t, idx, u, v = _run(tri_table, o, d, t_min, t_max, interpret=interpret)
    t, idx, u, v = (x[:R, 0] for x in (t, idx, u, v))
    hit = idx >= 0
    from ..accel.brute import HitResult, gather_triangles, _mask_triangle
    tri = _mask_triangle(gather_triangles(tris, jnp.clip(idx, 0, None)), hit)
    bary = jnp.where(hit[:, None], jnp.stack([1 - u - v, u, v], -1), 0.0)
    res = HitResult(hit=hit, triangle=tri, t=t, barycentric=bary,
                    prim_idx=jnp.where(hit, idx, -1),
                    instance_idx=jnp.where(hit, 0, -1))
    return jax.tree_util.tree_map(
        lambda a: a.reshape(batch + a.shape[1:]), res)
