"""Debug visualization helpers.

Counterpart of the reference's Makie extension (reference:
ext/RaycoreMakieExt.jl): `trace_rays` producing a structured intersection
result for plotting (`RayIntersectionResult`, ext/RaycoreMakieExt.jl:57-87),
plus image writers that need no plotting stack (PPM/PNG) and a one-call
scene preview via the wavefront renderer. Plot recipes themselves are
toolkit business; the data they need is all here.
"""
from __future__ import annotations

import struct
import zlib

import jax.numpy as jnp
import numpy as np
from flax import struct as fstruct

from ..core.ray import Ray
from ..core.sampling import sum_mul
from ..accel import dispatch as _disp


@fstruct.dataclass
class RayIntersectionResult:
    """Everything a plot recipe needs per ray (reference
    RayIntersectionResult)."""
    origins: jnp.ndarray      # (N, 3)
    directions: jnp.ndarray   # (N, 3)
    hits: jnp.ndarray         # (N,) bool
    points: jnp.ndarray       # (N, 3) hit points (0 on miss)
    t: jnp.ndarray            # (N,)
    instance_idx: jnp.ndarray  # (N,)
    metadata: jnp.ndarray     # (N,)


def trace_rays(scene, rays: Ray, **kw) -> RayIntersectionResult:
    """Batch query returning plot-ready data (reference trace_rays stub,
    src/Raycore.jl:116, implemented by the Makie ext)."""
    res = _disp.scene_closest_hit(scene, rays, **kw)
    flat = lambda a: a.reshape((-1,) + a.shape[len(rays.batch_shape):])
    pts = sum_mul(res.barycentric, res.triangle.vertices)
    return RayIntersectionResult(
        origins=flat(rays.o), directions=flat(rays.d),
        hits=flat(res.hit), points=flat(pts), t=flat(res.t),
        instance_idx=flat(res.instance_idx),
        metadata=flat(res.triangle.metadata))


def scene_preview(scene, materials=None, lights=None, camera=None,
                  width=320, height=240, spp=1):
    """Render a quick look at a StaticTLAS with default lighting/materials
    (the role of the reference's `plot(tlas)` recipe)."""
    import jax
    from .wavefront import (Camera, Materials, PointLights, RenderConfig,
                            WavefrontRenderer)
    lo, hi = np.asarray(scene.root_aabb)
    center = (lo + hi) / 2
    diag = float(np.linalg.norm(hi - lo))
    if camera is None:
        camera = Camera.create(position=center + np.array([0.8, -1.6, 0.9]) * diag,
                               target=center, up=(0, 0, 1), fov_deg=45.0)
    if lights is None:
        lights = PointLights(
            position=jnp.asarray([center + np.array([1.0, -1.0, 2.0]) * diag],
                                 jnp.float32),
            intensity=jnp.asarray([[4.0, 4.0, 4.0]], jnp.float32) * diag ** 2)
    if materials is None:
        n_meta = 1 + int(jnp.max(scene.prims.metadata))
        n_meta = min(n_meta, 4096)
        rng = np.random.default_rng(7)
        materials = Materials.create(
            base_color=rng.uniform(0.2, 0.9, (n_meta, 3)).astype(np.float32))
    r = WavefrontRenderer(scene, materials, lights, camera,
                          RenderConfig(width=width, height=height, spp=spp))
    return r.render(jax.random.PRNGKey(0))


def save_ppm(img, path: str):
    """Write an (H, W, 3) float image in [0,1] as binary PPM."""
    a = np.clip(np.asarray(img), 0, 1)
    b = (a * 255 + 0.5).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (b.shape[1], b.shape[0]))
        f.write(b.tobytes())


def save_png(img, path: str):
    """Minimal dependency-free PNG writer for (H, W, 3) float images."""
    a = np.clip(np.asarray(img), 0, 1)
    b = (a * 255 + 0.5).astype(np.uint8)
    h, w = b.shape[:2]
    raw = b"".join(b"\x00" + b[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)
