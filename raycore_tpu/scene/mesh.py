"""Host-side mesh construction utilities.

Counterpart of the reference's GeometryBasics.Mesh ingestion path
(reference: src/instanced-bvh.jl:551-646 — expand faceviews, decompose
vertices/normals/uvs/faces, per-face metadata callback or the default
``UInt32(face_idx)`` payload, drop degenerate faces).

Mesh decomposition runs on the host in NumPy — it happens once per geometry
at scene-build time; the resulting Triangle SoA is what lives on device.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.triangle import Triangle


def build_triangles(vertices, faces, normals=None, uvs=None, metadata=None,
                    drop_degenerate=True) -> Triangle:
    """Build a Triangle SoA from indexed mesh data.

    ``vertices``: (V, 3) float; ``faces``: (F, 3) int (0-based);
    ``normals``/``uvs``: per-vertex optional; ``metadata``: (F,) uint32 or a
    callable ``face_idx -> uint32`` applied per face. Defaults to the face
    index, matching the reference default payload.
    Degenerate faces (zero cross product) are dropped, as in the reference.
    """
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.int64)
    tri_v = vertices[faces]                      # (F, 3, 3)

    if metadata is None:
        meta = np.arange(len(faces), dtype=np.uint32)
    elif callable(metadata):
        meta = np.asarray([metadata(i) for i in range(len(faces))], np.uint32)
    else:
        meta = np.asarray(metadata, np.uint32)

    if normals is not None:
        tri_n = np.asarray(normals, np.float32)[faces]
    else:
        e1 = tri_v[:, 1] - tri_v[:, 0]
        e2 = tri_v[:, 2] - tri_v[:, 0]
        fn = np.cross(e1, e2)
        ln = np.linalg.norm(fn, axis=-1, keepdims=True)
        fn = fn / np.where(ln > 0, ln, 1.0)
        tri_n = np.repeat(fn[:, None, :], 3, axis=1)

    tri_uv = (np.asarray(uvs, np.float32)[faces] if uvs is not None
              else np.zeros((len(faces), 3, 2), np.float32))

    if drop_degenerate:
        cr = np.cross(tri_v[:, 2] - tri_v[:, 0], tri_v[:, 1] - tri_v[:, 0])
        keep = np.einsum("ij,ij->i", cr, cr) > 0.0
        tri_v, tri_n, tri_uv, meta = tri_v[keep], tri_n[keep], tri_uv[keep], meta[keep]

    tangents = np.zeros_like(tri_v)
    return Triangle(
        vertices=jnp.asarray(tri_v), normals=jnp.asarray(tri_n),
        tangents=jnp.asarray(tangents), uv=jnp.asarray(tri_uv),
        metadata=jnp.asarray(meta),
    )


def build_triangle(v0, v1, v2, metadata=0) -> Triangle:
    """Single triangle from three points (reference build_triangle)."""
    import jax.numpy as jnp
    v = np.stack([np.asarray(v0, np.float32), np.asarray(v1, np.float32),
                  np.asarray(v2, np.float32)])[None]
    e1 = v[0, 1] - v[0, 0]
    e2 = v[0, 2] - v[0, 0]
    n = np.cross(e1, e2)
    ln = np.linalg.norm(n)
    n = n / ln if ln > 0 else n
    return Triangle(
        vertices=jnp.asarray(v),
        normals=jnp.asarray(np.tile(n, (1, 3, 1)).astype(np.float32)),
        tangents=jnp.zeros((1, 3, 3), jnp.float32),
        uv=jnp.zeros((1, 3, 2), jnp.float32),
        metadata=jnp.asarray([metadata], jnp.uint32))


def is_degenerate_face(vertices, face) -> bool:
    """Host-side degenerate-face predicate (reference build path helper)."""
    v = np.asarray(vertices, np.float32)[np.asarray(face)]
    cr = np.cross(v[2] - v[0], v[1] - v[0])
    return bool(np.dot(cr, cr) <= 0.0)


# ---------------------------------------------------------------------------
# Procedural geometry (used by tests, examples, and the benchmark)
# ---------------------------------------------------------------------------

def uv_sphere(center=(0, 0, 0), radius=1.0, n_theta=16, n_phi=32):
    """UV sphere -> (vertices, faces, normals)."""
    center = np.asarray(center, np.float32)
    thetas = np.linspace(0, np.pi, n_theta + 1)
    phis = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    T, P = np.meshgrid(thetas, phis, indexing="ij")
    x = np.sin(T) * np.cos(P)
    y = np.sin(T) * np.sin(P)
    z = np.cos(T)
    pts = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    verts = center + radius * pts

    # Vectorized with the same emission order as the original Python loop
    # (per cell: upper then lower; row-major over (i, j)) — face order
    # defines default metadata ids downstream.
    I, J = np.meshgrid(np.arange(n_theta), np.arange(n_phi), indexing="ij")
    a = I * n_phi + J
    b = I * n_phi + (J + 1) % n_phi
    c = (I + 1) * n_phi + (J + 1) % n_phi
    d = (I + 1) * n_phi + J
    cell = np.stack([np.stack([a, b, c], -1),
                     np.stack([a, c, d], -1)], axis=2)   # (nt, np, 2, 3)
    valid = np.stack([I > 0, I < n_theta - 1], axis=2)   # (nt, np, 2)
    faces = cell.reshape(-1, 3)[valid.ravel()].astype(np.int64)
    # Orient faces so geometric normals point outward (away from center).
    tv = verts[faces]
    n = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    outward = tv.mean(1) - center
    flip = np.einsum("ij,ij->i", n, outward) < 0
    faces[flip] = faces[flip][:, ::-1]
    return verts, faces, pts


def sphere_mesh(center=(0, 0, 0), radius=1.0, n_theta=16, n_phi=32,
                metadata=None) -> Triangle:
    v, f, n = uv_sphere(center, radius, n_theta, n_phi)
    return build_triangles(v, f, normals=n, metadata=metadata)


def box_mesh(p_min=(-1, -1, -1), p_max=(1, 1, 1), metadata=None) -> Triangle:
    p0 = np.asarray(p_min, np.float32)
    p1 = np.asarray(p_max, np.float32)
    corners = np.array([[p1[0] if i & 1 else p0[0],
                         p1[1] if i & 2 else p0[1],
                         p1[2] if i & 4 else p0[2]] for i in range(8)],
                       np.float32)
    quads = [  # (v0, v1, v2, v3) outward CCW
        (0, 2, 3, 1),  # -z
        (4, 5, 7, 6),  # +z
        (0, 1, 5, 4),  # -y
        (2, 6, 7, 3),  # +y
        (0, 4, 6, 2),  # -x
        (1, 3, 7, 5),  # +x
    ]
    faces = []
    for a, b, c, d in quads:
        faces.append((a, b, c))
        faces.append((a, c, d))
    return build_triangles(corners, np.asarray(faces, np.int64),
                           metadata=metadata)


def plane_mesh(center=(0, 0, 0), u=(1, 0, 0), v=(0, 1, 0), metadata=None) -> Triangle:
    """A 2-triangle quad: center ± u ± v."""
    c = np.asarray(center, np.float32)
    u = np.asarray(u, np.float32)
    v = np.asarray(v, np.float32)
    verts = np.stack([c - u - v, c + u - v, c + u + v, c - u + v])
    faces = np.asarray([(0, 1, 2), (0, 2, 3)], np.int64)
    return build_triangles(verts, faces, metadata=metadata)


def blobby_mesh(n_theta=354, n_phi=354, radius=1.0, amplitude=0.25,
                seed=0, octaves=8, metadata=None) -> Triangle:
    """A closed 'scanned-statue' stand-in: a UV sphere displaced radially
    by multi-octave smooth noise — ~2*n_theta*n_phi triangles. Unlike the
    heightfield (one depth layer, hit_frac 1), every ray through it
    crosses >=2 surface layers and the silhouette mixes hits and misses,
    which is the depth-complexity profile of the reference's
    xyzrgb_dragon benchmark mesh (no mesh assets can be fetched in this
    environment, so benchmark scenes are procedural)."""
    rng = np.random.default_rng(seed)
    v, f, _ = uv_sphere((0.0, 0.0, 0.0), 1.0, n_theta, n_phi)
    p = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-9)
    disp = np.zeros(p.shape[0], np.float32)
    for i in range(octaves):
        k = rng.normal(size=3).astype(np.float32) * (1.3 ** i + 1.0)
        ph = np.float32(rng.uniform(0, 2 * np.pi))
        disp += np.sin(p @ k * np.pi + ph).astype(np.float32) / (1.25 ** i)
    disp *= amplitude / octaves * 2.0
    verts = (p * (radius * (1.0 + disp))[:, None]).astype(np.float32)
    return build_triangles(verts, f, metadata=metadata)


def displaced_grid_mesh(n=128, extent=2.0, amplitude=0.35, seed=0,
                        metadata=None) -> Triangle:
    """A bumpy heightfield grid with ~2*n^2 triangles — the procedural
    workload generator for benchmarks (arbitrary triangle counts, spatially
    coherent like a scanned model rather than random soup)."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(-extent / 2, extent / 2, n + 1, dtype=np.float32)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    Z = np.zeros_like(X)
    # Sum of random smooth waves.
    for _ in range(6):
        fx, fy = rng.uniform(0.5, 4.0, 2)
        ph = rng.uniform(0, 2 * np.pi, 2)
        Z += np.sin(fx * X * np.pi + ph[0]) * np.sin(fy * Y * np.pi + ph[1])
    Z *= amplitude / 6.0
    verts = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)

    idx = np.arange((n + 1) * (n + 1)).reshape(n + 1, n + 1)
    a = idx[:-1, :-1].ravel()
    b = idx[1:, :-1].ravel()
    c = idx[1:, 1:].ravel()
    d = idx[:-1, 1:].ravel()
    faces = np.concatenate([np.stack([a, b, c], -1), np.stack([a, c, d], -1)])
    return build_triangles(verts, faces, metadata=metadata)
