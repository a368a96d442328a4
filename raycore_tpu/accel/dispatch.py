"""Engine dispatch: route queries to the right accelerator for the scene.

Two interchangeable scene forms implement the query contract:
- `StaticTLAS`  -> two-level BVH wavefront traversal (general: instancing,
                   dynamic scenes, any ray distribution),
- `DenseScene`  -> dense clustered MXU engine (single geometry; the TPU
                   fast path). Queries go through the Pallas worklist
                   kernel: unlike the XLA rounds variant, its work is
                   exactly the per-tile candidate set, so tiles with
                   escaping rays don't amplify into global extra rounds.

The renderers and the analysis layer call through these functions so either
scene form plugs in (the AbstractAccel idea applied at the query level).
"""
from __future__ import annotations

import jax

from .brute import HitResult
from .dense import DenseScene, any_hit_dense, closest_hit_dense
from .types import StaticTLAS
from . import traversal as _trav


def _dense_caps(scene: DenseScene):
    """Worklist capacity: exact (never overflows) when the cluster count is
    small; otherwise a generous cap — callers with huge scenes should size
    explicitly via the engine API."""
    K = scene.n_clusters
    return K if K <= 128 else 64


def scene_closest_hit(scene, rays, *, tile_size: int = 16384) -> HitResult:
    if isinstance(scene, DenseScene):
        from ..ops.pallas_dense import closest_hit_dense_pallas
        return closest_hit_dense_pallas(
            scene, rays, tile=min(1024, max(tile_size, 8)),
            max_pairs_per_tile=_dense_caps(scene), passes=1,
            check_overflow=False)
    return _trav.closest_hit(scene, rays, tile_size=tile_size)


def scene_any_hit(scene, rays, *, tile_size: int = 16384) -> HitResult:
    if isinstance(scene, DenseScene):
        import jax.numpy as jnp
        rays0 = rays.replace(t_min=jnp.zeros_like(rays.t_min))
        from ..ops.pallas_dense import closest_hit_dense_pallas
        return closest_hit_dense_pallas(
            scene, rays0, tile=min(1024, max(tile_size, 8)),
            max_pairs_per_tile=_dense_caps(scene), passes=1,
            check_overflow=False)
    return _trav.any_hit(scene, rays, tile_size=tile_size)


def scene_root_aabb(scene):
    return scene.root_aabb
