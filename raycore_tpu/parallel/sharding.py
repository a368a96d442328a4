"""Multi-chip scaling: data-parallel ray sharding over a device mesh.

The reference is a single-device library (SURVEY.md §2.9, §5.8: no
inter-device communication anywhere); its scalable dimension is the number
of rays in flight. The TPU-native scaling strategy is therefore:

- the frozen scene pytree (flat node/prim/instance buffers) is REPLICATED
  on every chip,
- the ray wavefront is SHARDED along its batch dimension over the mesh,
- analysis reductions (illumination histograms, view-factor rows) come back
  replicated, which makes XLA insert the psum/all-reduce over ICI.

No explicit collectives are written here — shardings are declared with
`jax.sharding.NamedSharding` and XLA/pjit inserts the communication.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.ray import Ray
from ..accel import dispatch as _disp, traversal as _trav
from ..accel.types import StaticTLAS

RAY_AXIS = "rays"


def make_mesh(devices=None, axis_name: str = RAY_AXIS) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def replicate_scene(scene: StaticTLAS, mesh: Mesh) -> StaticTLAS:
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, rep), scene)


def shard_rays(rays: Ray, mesh: Mesh) -> Ray:
    """Shard the flat ray batch over the mesh's ray axis. The batch size
    must be divisible by the axis size (pad upstream with t_max=-1 rays)."""
    shard = lambda spec: lambda a: jax.device_put(a, NamedSharding(mesh, spec))
    return Ray(o=shard(P(RAY_AXIS, None))(rays.o),
               d=shard(P(RAY_AXIS, None))(rays.d),
               t_min=shard(P(RAY_AXIS))(rays.t_min),
               t_max=shard(P(RAY_AXIS))(rays.t_max),
               time=shard(P(RAY_AXIS))(rays.time))


def pad_rays_to(rays: Ray, multiple: int) -> Ray:
    n = rays.o.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return rays
    pad = target - n

    def ext(a, fill):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])

    return Ray(o=ext(rays.o, 0.0), d=ext(rays.d, 1.0),
               t_min=ext(rays.t_min, 0.0), t_max=ext(rays.t_max, -1.0),
               time=ext(rays.time, 0.0))


def distributed_closest_hit(scene: StaticTLAS, rays: Ray, mesh: Mesh,
                            tile_size: int = 16384):
    """closest_hit with rays sharded over the mesh, scene replicated.
    Returns a HitResult sharded like the rays."""
    scene = replicate_scene(scene, mesh)
    rays = shard_rays(pad_rays_to(rays, mesh.size), mesh)
    return _disp.scene_closest_hit(scene, rays, tile_size=tile_size)


@partial(jax.jit, static_argnames=("n_bins", "tile_size"))
def _illumination_step(scene: StaticTLAS, rays: Ray, n_bins: int,
                       tile_size: int):
    """One full sharded analysis step: trace + shade + global histogram.
    The (n_bins,) output is replicated => XLA inserts the cross-chip
    reduction over ICI."""
    res = _disp.scene_closest_hit(scene, rays, tile_size=tile_size)
    idx = jnp.clip(res.triangle.metadata.astype(jnp.int32), 0, n_bins - 1)
    hist = jnp.zeros((n_bins,), jnp.float32).at[idx].add(
        res.hit.astype(jnp.float32), mode="drop")
    return res.t, hist


def distributed_illumination(scene: StaticTLAS, rays: Ray, mesh: Mesh,
                             n_bins: int, tile_size: int = 16384):
    """The flagship multi-chip step: sharded rays -> per-chip trace ->
    all-reduced per-triangle hit histogram (the multi-chip form of
    get_illumination, reference src/kernels.jl:112-124)."""
    scene = replicate_scene(scene, mesh)
    rays = shard_rays(pad_rays_to(rays, mesh.size), mesh)
    return _illumination_step(scene, rays, n_bins, tile_size)
