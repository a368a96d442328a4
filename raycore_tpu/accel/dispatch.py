"""Engine dispatch: route queries to the right accelerator for the scene.

Two interchangeable scene forms implement the query contract:
- `StaticTLAS`  -> two-level BVH wavefront traversal (general: instancing,
                   dynamic scenes, any ray distribution),
- `DenseScene`  -> dense clustered MXU engine (single geometry, coherent
                   ray batches; the TPU fast path).

The renderers and the analysis layer call through these functions so either
scene form plugs in (the AbstractAccel idea applied at the query level).
"""
from __future__ import annotations

from .brute import HitResult
from .dense import DenseScene, any_hit_dense, closest_hit_dense
from .types import StaticTLAS
from . import traversal as _trav


def scene_closest_hit(scene, rays, *, tile_size: int = 16384) -> HitResult:
    if isinstance(scene, DenseScene):
        return closest_hit_dense(scene, rays,
                                 tile=min(2048, max(tile_size, 8)))
    return _trav.closest_hit(scene, rays, tile_size=tile_size)


def scene_any_hit(scene, rays, *, tile_size: int = 16384) -> HitResult:
    if isinstance(scene, DenseScene):
        return any_hit_dense(scene, rays, tile=min(2048, max(tile_size, 8)))
    return _trav.any_hit(scene, rays, tile_size=tile_size)


def scene_root_aabb(scene):
    return scene.root_aabb
