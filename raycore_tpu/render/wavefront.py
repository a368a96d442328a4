"""Wavefront path-tracing renderer — the flagship workload.

TPU-native port of the reference's canonical consumer (reference:
docs/src/wavefront-renderer.jl): the 9-stage SoA pipeline
(primary rays -> intersect -> shadow rays -> occlusion -> lambert shade ->
reflection rays -> intersect -> blend -> accumulate) expressed as one jit
step over SoA wavefront queues.

TPU-native improvement over the reference: between bounces, rays are
COMPACTED by sorting on the active mask — inactive lanes cluster into
whole tiles whose traversal while_loops retire immediately (the reference
keeps dense queues with dummy rays; SURVEY.md §2.6 "no compaction").

Materials are an SoA table indexed by triangle metadata (the reference's
per-mesh material-index payload, docs/src/raytracing-core.jl:29-44).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.ray import Ray
from ..core.triangle import bary_interp
from ..core.sampling import reflect
from ..accel import dispatch as _disp
from ..accel.types import StaticTLAS


@struct.dataclass
class Materials:
    """SoA material table (reference Material,
    docs/src/raytracing-core.jl:29-38)."""
    base_color: jnp.ndarray   # (M, 3)
    metallic: jnp.ndarray     # (M,)
    roughness: jnp.ndarray    # (M,)
    ior: jnp.ndarray          # (M,)
    transmission: jnp.ndarray  # (M,)

    @classmethod
    def create(cls, base_color, metallic=None, roughness=None, ior=None,
               transmission=None):
        base_color = jnp.asarray(base_color, jnp.float32)
        m = base_color.shape[0]
        z = lambda v, d: (jnp.full((m,), d, jnp.float32) if v is None
                          else jnp.asarray(v, jnp.float32))
        return cls(base_color=base_color, metallic=z(metallic, 0.0),
                   roughness=z(roughness, 0.0), ior=z(ior, 1.5),
                   transmission=z(transmission, 0.0))


@struct.dataclass
class PointLights:
    """SoA point lights (reference PointLight,
    docs/src/raytracing-core.jl:23-27)."""
    position: jnp.ndarray   # (L, 3)
    intensity: jnp.ndarray  # (L, 3)


@struct.dataclass
class Camera:
    position: jnp.ndarray
    target: jnp.ndarray
    up: jnp.ndarray
    fov_deg: jnp.ndarray

    @classmethod
    def create(cls, position, target, up=(0, 0, 1), fov_deg=45.0):
        f = lambda x: jnp.asarray(x, jnp.float32)
        return cls(position=f(position), target=f(target), up=f(up),
                   fov_deg=f(fov_deg))


def camera_basis(cam: Camera):
    fwd = cam.target - cam.position
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, cam.up)
    right = right / jnp.linalg.norm(right)
    up = jnp.cross(right, fwd)
    return fwd, right, up


def generate_primary_rays(cam: Camera, width: int, height: int, spp: int,
                          key) -> Ray:
    """Stage 1: pinhole lookat rays, spp jittered samples per pixel
    (reference generate_primary_rays_lookat!)."""
    fwd, right, up = camera_basis(cam)
    tan_half = jnp.tan(jnp.deg2rad(cam.fov_deg) * 0.5)
    aspect = width / height
    jit = jax.random.uniform(key, (height, width, spp, 2), jnp.float32)
    px = jnp.arange(width, dtype=jnp.float32)[None, :, None]
    py = jnp.arange(height, dtype=jnp.float32)[:, None, None]
    u = ((px + jit[..., 0]) / width * 2.0 - 1.0) * tan_half * aspect
    v = (1.0 - (py + jit[..., 1]) / height * 2.0) * tan_half
    d = fwd + u[..., None] * right + v[..., None] * up
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam.position, d.shape)
    return Ray.create(o=o.reshape(-1, 3), d=d.reshape(-1, 3))


def _mat_lookup(materials: Materials, idx):
    idx = jnp.clip(idx, 0, materials.base_color.shape[0] - 1)
    take = lambda a: jnp.take(a, idx, axis=0)
    return jax.tree_util.tree_map(take, materials)


def compact_order(active):
    """Stable order putting active lanes first — inactive lanes cluster
    into tiles that retire instantly in the traversal lax.map."""
    return jnp.argsort(~active, stable=True)


@struct.dataclass
class RenderConfig:
    width: int = struct.field(pytree_node=False, default=256)
    height: int = struct.field(pytree_node=False, default=256)
    spp: int = struct.field(pytree_node=False, default=1)
    ambient: float = struct.field(pytree_node=False, default=0.08)
    shadow_eps: float = struct.field(pytree_node=False, default=1e-3)
    reflect_eps: float = struct.field(pytree_node=False, default=1e-3)
    tile_size: int = struct.field(pytree_node=False, default=16384)
    background: tuple = struct.field(pytree_node=False,
                                     default=(0.05, 0.07, 0.12))


def _shade_lambert(hit_p, hit_n, view_dir, mats, lights: PointLights,
                   occluded, ambient):
    """Stages 4-5: lambert + inverse-square attenuation + hard shadows +
    ambient (reference shade_primary_hits!)."""
    to_l = lights.position[None, :, :] - hit_p[:, None, :]     # (R, L, 3)
    dist2 = jnp.sum(to_l * to_l, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    wi = to_l / dist[..., None]
    ndotl = jnp.maximum(jnp.sum(hit_n[:, None, :] * wi, -1), 0.0)
    vis = jnp.where(occluded, 0.0, 1.0)
    irr = lights.intensity[None] * (ndotl * vis / jnp.maximum(dist2, 1e-12))[..., None]
    diffuse = mats.base_color * (jnp.sum(irr, axis=1) + ambient)
    return diffuse


@partial(jax.jit, static_argnames=("cfg",))
def render_step(scene: StaticTLAS, materials: Materials, lights: PointLights,
                cam: Camera, key, cfg: RenderConfig):
    """One full wavefront frame -> (H, W, 3) image (reference render!,
    docs/src/wavefront-renderer.jl:758-883, with compaction added)."""
    H, W, spp = cfg.height, cfg.width, cfg.spp
    R = H * W * spp
    n_lights = lights.position.shape[0]

    # Stage 1-2: primary rays + intersect.
    rays = generate_primary_rays(cam, W, H, spp, key)
    res = _disp.scene_closest_hit(scene, rays, tile_size=cfg.tile_size)

    hit = res.hit
    tri = res.triangle
    hit_p = bary_interp(res.barycentric, tri.vertices)
    # Smooth normal from barycentric-interpolated vertex normals; flip
    # toward the viewer (face_forward).
    n = bary_interp(res.barycentric, tri.normals)
    nl = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(nl > 1e-8, n / jnp.where(nl > 0, nl, 1.0), 0.0)
    n = jnp.where(jnp.sum(n * rays.d, -1, keepdims=True) > 0, -n, n)

    mats = _mat_lookup(materials, tri.metadata.astype(jnp.int32))

    # Stage 3-4: shadow rays (hits x lights) tested with any_hit, t_max =
    # light distance (reference generate_shadow_rays!/test_shadow_rays!).
    to_l = lights.position[None] - hit_p[:, None]
    dist = jnp.linalg.norm(to_l, axis=-1)
    wi = to_l / jnp.maximum(dist[..., None], 1e-12)
    so = (hit_p + n * cfg.shadow_eps)[:, None, :] \
        .repeat(n_lights, 1).reshape(-1, 3)
    sd = wi.reshape(-1, 3)
    st = jnp.where(jnp.repeat(hit, n_lights),
                   (dist - 2 * cfg.shadow_eps).reshape(-1), -1.0)
    occl = _disp.scene_any_hit(scene, Ray.create(o=so, d=sd, t_max=st),
                              tile_size=cfg.tile_size)
    occluded = occl.hit.reshape(R, n_lights)

    # Stage 5: shade primaries.
    view_dir = -rays.d
    color = _shade_lambert(hit_p, n, view_dir, mats, lights, occluded,
                           cfg.ambient)
    bg = jnp.asarray(cfg.background, jnp.float32)
    color = jnp.where(hit[:, None], color, bg)

    # Stage 6-8: one metallic reflection bounce, traced COMPACTED.
    refl_active = hit & (mats.metallic > 0.0)
    rd = reflect(view_dir, n)
    # Roughness jitter (reference generate_reflection_rays!,
    # docs/src/wavefront-renderer.jl:457-459): uniform [-1,1]^3 offset
    # scaled by material roughness, renormalized. roughness=0 mirrors
    # exactly (offset is zero).
    offs = (jax.random.uniform(jax.random.fold_in(key, 1), rd.shape,
                               jnp.float32) * 2.0 - 1.0)
    rd = rd + offs * mats.roughness[:, None]
    rd = rd / jnp.maximum(jnp.linalg.norm(rd, axis=-1, keepdims=True), 1e-12)
    order = compact_order(refl_active)
    inv_order = jnp.argsort(order)
    ro_c = (hit_p + n * cfg.reflect_eps)[order]
    rd_c = rd[order]
    act_c = refl_active[order]
    rres = _disp.scene_closest_hit(
        scene, Ray.create(o=ro_c, d=rd_c,
                          t_max=jnp.where(act_c, jnp.inf, -1.0)),
        tile_size=cfg.tile_size)
    rres = jax.tree_util.tree_map(lambda a: a[inv_order], rres)

    r_tri = rres.triangle
    r_p = bary_interp(rres.barycentric, r_tri.vertices)
    r_n = bary_interp(rres.barycentric, r_tri.normals)
    rnl = jnp.linalg.norm(r_n, axis=-1, keepdims=True)
    r_n = jnp.where(rnl > 1e-8, r_n / jnp.where(rnl > 0, rnl, 1.0), 0.0)
    r_n = jnp.where(jnp.sum(r_n * rd, -1, keepdims=True) > 0, -r_n, r_n)
    r_mats = _mat_lookup(materials, r_tri.metadata.astype(jnp.int32))

    r_to_l = lights.position[None] - r_p[:, None]
    r_d2 = jnp.sum(r_to_l * r_to_l, -1)
    r_wi = r_to_l / jnp.maximum(jnp.sqrt(r_d2)[..., None], 1e-12)
    r_ndotl = jnp.maximum(jnp.sum(r_n[:, None] * r_wi, -1), 0.0)
    r_irr = lights.intensity[None] * (r_ndotl / jnp.maximum(r_d2, 1e-12))[..., None]
    r_color = r_mats.base_color * (jnp.sum(r_irr, 1) + cfg.ambient)
    r_color = jnp.where(rres.hit[:, None], r_color, bg)

    # Blend: metallic lerp toward the reflected color, tinted by base color
    # (reference shade_reflections_and_blend!).
    m = mats.metallic[:, None]
    color = jnp.where(refl_active[:, None],
                      color * (1 - m) + r_color * mats.base_color * m,
                      color)

    # Stage 9: accumulate sample mean (reference accumulate_final!).
    img = color.reshape(H, W, spp, 3).mean(axis=2)
    return jnp.clip(img, 0.0, 1.0)


class WavefrontRenderer:
    """Holds the frozen scene + materials + lights + config; `render(key)`
    dispatches the whole pipeline as one jit step (reference
    WavefrontRenderer struct + render!, docs/src/wavefront-renderer.jl:647-883)."""

    def __init__(self, scene: StaticTLAS, materials: Materials,
                 lights: PointLights, camera: Camera,
                 config: Optional[RenderConfig] = None):
        self.scene = scene
        self.materials = materials
        self.lights = lights
        self.camera = camera
        self.config = config or RenderConfig()

    def render(self, key=None) -> jnp.ndarray:
        if key is None:
            key = jax.random.PRNGKey(0)
        return render_step(self.scene, self.materials, self.lights,
                           self.camera, key, self.config)
