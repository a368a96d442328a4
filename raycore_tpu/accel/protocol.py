"""The AbstractAccel contract.

Counterpart of the reference's abstract-type contract (reference:
src/Raycore.jl:14-48): any acceleration structure exposes the same
mutation/lifecycle/query protocol — push/delete/update_transform, sync as
the sole owner of the frozen form, closest_hit/any_hit, world_bound,
n_instances/n_geometries, wait_for_gpu. The reference has two
implementations (software TLAS and Vulkan HW Lava.HWTLAS); here the second
implementation is a brute-force accel (no BVH at all), which doubles as the
semantic oracle in the contract tests.
"""
from __future__ import annotations

import abc
from typing import Any

import jax
import numpy as np

from ..core.ray import Ray
from .brute import HitResult


class AbstractAccel(abc.ABC):
    """Scene-level acceleration structure protocol."""

    # -- mutation -----------------------------------------------------
    @abc.abstractmethod
    def push(self, tris, transform=None, *, instance_id: int = 0,
             transforms=None): ...

    @abc.abstractmethod
    def delete(self, handle) -> None: ...

    @abc.abstractmethod
    def update_transform(self, handle, transform) -> None: ...

    @abc.abstractmethod
    def sync(self) -> Any:
        """Commit mutations; returns (and owns) the frozen adapted form."""

    # -- queries ------------------------------------------------------
    @abc.abstractmethod
    def closest_hit(self, rays: Ray) -> HitResult: ...

    @abc.abstractmethod
    def any_hit(self, rays: Ray) -> HitResult: ...

    @abc.abstractmethod
    def world_bound(self) -> np.ndarray: ...

    @property
    @abc.abstractmethod
    def n_instances(self) -> int: ...

    @property
    @abc.abstractmethod
    def n_geometries(self) -> int: ...

    def wait_for_gpu(self):
        """Block until device work finishes; chainable (reference
        wait_for_gpu!, src/instanced-bvh.jl:2418-2421)."""
        return self


class TLASAccel(AbstractAccel):
    """The production implementation: mutable TLAS + BVH traversal."""

    def __init__(self):
        from ..scene.tlas import TLAS
        self._tlas = TLAS()

    def push(self, tris, transform=None, *, instance_id=0, transforms=None):
        return self._tlas.push(tris, transform, instance_id=instance_id,
                               transforms=transforms)

    def delete(self, handle):
        self._tlas.delete(handle)

    def update_transform(self, handle, transform):
        self._tlas.update_transform(handle, transform)

    def sync(self):
        return self._tlas.sync()

    def closest_hit(self, rays: Ray) -> HitResult:
        from . import traversal as _trav
        return _trav.closest_hit(self._tlas.sync(), rays)

    def any_hit(self, rays: Ray) -> HitResult:
        from . import traversal as _trav
        return _trav.any_hit(self._tlas.sync(), rays)

    def world_bound(self):
        return self._tlas.world_bound()

    @property
    def n_instances(self):
        return self._tlas.n_instances

    @property
    def n_geometries(self):
        return self._tlas.n_geometries

    def wait_for_gpu(self):
        if self._tlas._static is not None:
            jax.block_until_ready(self._tlas._static.unified_nodes)
        return self


class BruteAccel(AbstractAccel):
    """Second implementation of the contract: exhaustive intersection over
    world-space-transformed triangles. No BVH; the semantic oracle."""

    def __init__(self):
        self._groups = {}     # handle id -> (tris, [transforms], instance_id)
        self._next = 1
        self._world = None

    def push(self, tris, transform=None, *, instance_id=0, transforms=None):
        from ..scene.tlas import TLASHandle
        mats = transforms if transforms is not None else [transform]
        mats = [np.eye(3, 4, dtype=np.float32) if m is None
                else np.asarray(m, np.float32)[:3, :4] for m in mats]
        hid = self._next
        self._next += 1
        self._groups[hid] = [tris, mats, instance_id]
        self._world = None
        return TLASHandle(hid)

    def delete(self, handle):
        del self._groups[handle.id]
        self._world = None

    def update_transform(self, handle, transform):
        m = np.asarray(transform, np.float32)[:3, :4]
        self._groups[handle.id][1] = [m] * len(self._groups[handle.id][1])
        self._world = None

    def sync(self):
        import jax.numpy as jnp
        if self._world is not None:
            return self._world
        parts = []
        inst_of = []
        inst = 0
        for tris, mats, _ in self._groups.values():
            for m in mats:
                v = np.asarray(tris.vertices) @ m[:, :3].T + m[:, 3]
                parts.append((v, np.asarray(tris.normals),
                              np.asarray(tris.uv), np.asarray(tris.metadata)))
                inst_of.append(np.full(len(v), inst, np.int32))
                inst += 1
        from ..core.triangle import Triangle
        v = np.concatenate([p[0] for p in parts])
        self._world = (Triangle(
            vertices=jnp.asarray(v),
            normals=jnp.asarray(np.concatenate([p[1] for p in parts])),
            tangents=jnp.zeros_like(jnp.asarray(v)),
            uv=jnp.asarray(np.concatenate([p[2] for p in parts])),
            metadata=jnp.asarray(np.concatenate([p[3] for p in parts]))),
            jnp.asarray(np.concatenate(inst_of)))
        return self._world

    def closest_hit(self, rays: Ray) -> HitResult:
        from .brute import closest_hit_brute
        import jax.numpy as jnp
        tris, inst_of = self.sync()
        res = closest_hit_brute(tris, rays)
        inst = jnp.where(res.hit,
                         jnp.take(inst_of, jnp.clip(res.prim_idx, 0, None)),
                         -1)
        return res.replace(instance_idx=inst)

    def any_hit(self, rays: Ray) -> HitResult:
        from .brute import any_hit_brute
        import jax.numpy as jnp
        tris, inst_of = self.sync()
        res = any_hit_brute(tris, rays)
        inst = jnp.where(res.hit,
                         jnp.take(inst_of, jnp.clip(res.prim_idx, 0, None)),
                         -1)
        return res.replace(instance_idx=inst)

    def world_bound(self):
        tris, _ = self.sync()
        v = np.asarray(tris.vertices)
        return np.stack([v.min((0, 1)), v.max((0, 1))])

    @property
    def n_instances(self):
        return sum(len(m) for _, m, _ in self._groups.values())

    @property
    def n_geometries(self):
        return len(self._groups)
