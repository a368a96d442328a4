"""Simple per-pixel renderer kernels.

Counterpart of the reference's CPU tutorial renderer (reference:
docs/src/raytracing-core.jl): `trace(f, scene; ...)` drives a pinhole
camera over a pixel grid and applies a user shading kernel per sample;
stock kernels cover depth, hard/soft shadows, multi-light lambert, and
1-bounce reflection. The threaded per-pixel loop becomes one batched jit
trace; soft shadows take an explicit PRNG key.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core.ray import Ray
from ..core.triangle import bary_interp
from ..core.sampling import reflect, concentric_sample_disk
from ..accel import dispatch as _disp
from .wavefront import Camera, Materials, PointLights, camera_basis


class Shading(NamedTuple):
    """What a shading kernel receives per sample (all batched)."""
    rays: Ray
    hit: jnp.ndarray
    point: jnp.ndarray
    normal: jnp.ndarray
    t: jnp.ndarray
    metadata: jnp.ndarray


def _primary(cam: Camera, width, height, spp, key):
    fwd, right, up = camera_basis(cam)
    tan_half = jnp.tan(jnp.deg2rad(cam.fov_deg) * 0.5)
    aspect = width / height
    jit = jax.random.uniform(key, (height, width, spp, 2), jnp.float32) \
        if spp > 1 else jnp.full((height, width, 1, 2), 0.5, jnp.float32)
    px = jnp.arange(width, dtype=jnp.float32)[None, :, None]
    py = jnp.arange(height, dtype=jnp.float32)[:, None, None]
    u = ((px + jit[..., 0]) / width * 2 - 1) * tan_half * aspect
    v = (1 - (py + jit[..., 1]) / height * 2) * tan_half
    d = fwd + u[..., None] * right + v[..., None] * up
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return Ray.create(o=jnp.broadcast_to(cam.position, d.shape).reshape(-1, 3),
                      d=d.reshape(-1, 3))


def trace(kernel: Callable[..., jnp.ndarray], scene, cam: Camera, *,
          width=256, height=256, spp=1, key=None, tile_size=16384,
          **kernel_kwargs):
    """Render with a user kernel `(scene, Shading, key, **kw) -> (R, 3)`
    (reference trace(f, bvh; ...), docs/src/raytracing-core.jl:85-166)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    kc, ks = jax.random.split(key)
    rays = _primary(cam, width, height, spp, kc)
    res = _disp.scene_closest_hit(scene, rays, tile_size=tile_size)
    p = bary_interp(res.barycentric, res.triangle.vertices)
    n = bary_interp(res.barycentric, res.triangle.normals)
    ln = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(ln > 1e-8, n / jnp.where(ln > 0, ln, 1.0), 0.0)
    n = jnp.where(jnp.sum(n * rays.d, -1, keepdims=True) > 0, -n, n)
    sh = Shading(rays=rays, hit=res.hit, point=p, normal=n, t=res.t,
                 metadata=res.triangle.metadata)
    color = kernel(scene, sh, ks, **kernel_kwargs)
    return jnp.clip(color.reshape(height, width, spp, 3).mean(2), 0.0, 1.0)


# -- stock kernels (reference docs/src/raytracing-core.jl:85-166) -----------

def depth_kernel(scene, sh: Shading, key, *, t_scale=0.15):
    """Grayscale depth (nearer = brighter)."""
    g = jnp.where(sh.hit, jnp.exp(-sh.t * t_scale), 0.0)
    return jnp.stack([g, g, g], -1)


def normal_kernel(scene, sh: Shading, key):
    return jnp.where(sh.hit[:, None], sh.normal * 0.5 + 0.5, 0.0)


def shadow_kernel(scene, sh: Shading, key, *, light_pos=(5, -5, 8),
                  light_radius=0.0, n_shadow=4, eps=1e-3,
                  base_color=(0.8, 0.8, 0.8), tile_size=16384):
    """Hard (radius 0) or soft shadows via disk-sampled light positions
    (reference shadow kernels)."""
    light_pos = jnp.asarray(light_pos, jnp.float32)
    R = sh.point.shape[0]
    if light_radius > 0:
        u = jax.random.uniform(key, (n_shadow, R, 2))
        disk = concentric_sample_disk(u) * light_radius   # (S, R, 2)
        lp = light_pos + jnp.concatenate(
            [disk, jnp.zeros((n_shadow, R, 1))], -1)
    else:
        n_shadow = 1
        lp = light_pos[None, None, :].repeat(R, 1)
    to_l = lp - sh.point[None]
    dist = jnp.linalg.norm(to_l, axis=-1)
    wi = to_l / jnp.maximum(dist[..., None], 1e-12)
    o = (sh.point + sh.normal * eps)[None].repeat(n_shadow, 0)
    occ = _disp.scene_any_hit(
        scene, Ray.create(o=o.reshape(-1, 3), d=wi.reshape(-1, 3),
                          t_max=jnp.where(jnp.tile(sh.hit, n_shadow),
                                          (dist - 2 * eps).reshape(-1), -1.0)),
        tile_size=tile_size).hit.reshape(n_shadow, R)
    lit = 1.0 - occ.mean(0)
    ndotl = jnp.maximum(jnp.sum(sh.normal * wi[0], -1), 0.0)
    c = jnp.asarray(base_color) * (lit * ndotl + 0.07)[:, None]
    return jnp.where(sh.hit[:, None], c, 0.02)


def multi_light_kernel(scene, sh: Shading, key, *, lights: PointLights,
                       materials: Materials, eps=1e-3, tile_size=16384):
    """Lambert with several point lights + occlusion (reference multi-light
    kernel)."""
    L = lights.position.shape[0]
    to_l = lights.position[None] - sh.point[:, None]
    dist = jnp.linalg.norm(to_l, axis=-1)
    wi = to_l / jnp.maximum(dist[..., None], 1e-12)
    o = (sh.point + sh.normal * eps)[:, None].repeat(L, 1)
    occ = _disp.scene_any_hit(
        scene, Ray.create(o=o.reshape(-1, 3), d=wi.reshape(-1, 3),
                          t_max=jnp.where(jnp.repeat(sh.hit, L),
                                          (dist - 2 * eps).reshape(-1), -1.0)),
        tile_size=tile_size).hit.reshape(-1, L)
    ndotl = jnp.maximum(jnp.sum(sh.normal[:, None] * wi, -1), 0.0)
    irr = lights.intensity[None] * (ndotl * (1 - occ)
                                    / jnp.maximum(dist ** 2, 1e-12))[..., None]
    mi = jnp.clip(sh.metadata.astype(jnp.int32), 0,
                  materials.base_color.shape[0] - 1)
    base = jnp.take(materials.base_color, mi, axis=0)
    return jnp.where(sh.hit[:, None],
                     base * (jnp.sum(irr, 1) + 0.06), 0.02)


def reflective_kernel(scene, sh: Shading, key, *, lights: PointLights,
                      materials: Materials, eps=1e-3, tile_size=16384):
    """Multi-light lambert + one metallic bounce (reference reflective
    kernel with 1-bounce)."""
    base = multi_light_kernel(scene, sh, key, lights=lights,
                              materials=materials, eps=eps,
                              tile_size=tile_size)
    mi = jnp.clip(sh.metadata.astype(jnp.int32), 0,
                  materials.base_color.shape[0] - 1)
    metal = jnp.take(materials.metallic, mi, axis=0)
    rd = reflect(-sh.rays.d, sh.normal)
    rd = rd / jnp.maximum(jnp.linalg.norm(rd, -1, keepdims=True), 1e-12)
    active = sh.hit & (metal > 0)
    rres = _disp.scene_closest_hit(
        scene, Ray.create(o=sh.point + sh.normal * eps, d=rd,
                          t_max=jnp.where(active, jnp.inf, -1.0)),
        tile_size=tile_size)
    rp = bary_interp(rres.barycentric, rres.triangle.vertices)
    rn = bary_interp(rres.barycentric, rres.triangle.normals)
    rln = jnp.linalg.norm(rn, -1, keepdims=True)
    rn = jnp.where(rln > 1e-8, rn / jnp.where(rln > 0, rln, 1.0), 0.0)
    rsh = Shading(rays=Ray.create(o=sh.point, d=rd), hit=rres.hit, point=rp,
                  normal=rn, t=rres.t, metadata=rres.triangle.metadata)
    rcol = multi_light_kernel(scene, rsh, key, lights=lights,
                              materials=materials, eps=eps,
                              tile_size=tile_size)
    m = metal[:, None]
    return jnp.where(active[:, None], base * (1 - m) + rcol * m, base)
