"""Scene serialization: save/load frozen scenes.

The reference has no checkpoint story (SURVEY.md §5.4 — scenes are
rebuildable from meshes; the nearest concept is the sync commit boundary +
revision counter). For a production serving framework the frozen scene
pytrees ARE the deployable artifact, so this module adds what the
reference lacks: dependency-free .npz round-tripping of StaticTLAS and
DenseScene, so a built accelerator can ship to a fleet without rebuilding.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..accel.types import BLAS, Instances, StaticTLAS
from ..accel.dense import DenseScene
from ..core.triangle import Triangle

_STATIC_FIELDS = {
    "StaticTLAS": ("n_instances", "instance_capacity", "n_blas"),
    "DenseScene": ("n_prims", "cluster_size"),
}


def _tri_arrays(prefix, t: Triangle):
    return {f"{prefix}vertices": t.vertices, f"{prefix}normals": t.normals,
            f"{prefix}tangents": t.tangents, f"{prefix}uv": t.uv,
            f"{prefix}metadata": t.metadata}


def _tri_from(prefix, z) -> Triangle:
    g = lambda k: jnp.asarray(z[f"{prefix}{k}"])
    return Triangle(vertices=g("vertices"), normals=g("normals"),
                    tangents=g("tangents"), uv=g("uv"), metadata=g("metadata"))


def save_scene(path: str, scene) -> None:
    """Write a StaticTLAS or DenseScene to an .npz file."""
    if isinstance(scene, StaticTLAS):
        arrs = dict(
            kind=np.asarray("StaticTLAS"),
            unified_nodes=scene.unified_nodes,
            inst_transform=scene.instances.transform,
            inst_inv_transform=scene.instances.inv_transform,
            inst_blas_index=scene.instances.blas_index,
            inst_instance_id=scene.instances.instance_id,
            inst_mask=scene.instances.mask,
            blas_nodes_offset=scene.blas_nodes_offset,
            blas_prims_offset=scene.blas_prims_offset,
            blas_root_aabb=scene.blas_root_aabb,
            root_aabb=scene.root_aabb,
            statics=np.asarray([scene.n_instances, scene.instance_capacity,
                                scene.n_blas]),
            **_tri_arrays("prims_", scene.prims))
    elif isinstance(scene, DenseScene):
        arrs = dict(
            kind=np.asarray("DenseScene"),
            tri_feats=scene.tri_feats, cluster_min=scene.cluster_min,
            cluster_max=scene.cluster_max, sub_bounds=scene.sub_bounds,
            prims_hot=scene.prims_hot,
            root_aabb=scene.root_aabb,
            statics=np.asarray([scene.n_prims, scene.cluster_size,
                                scene.sub_chunks, scene.payload_mask]),
            **_tri_arrays("prims_", scene.prims))
        if scene.instance_of_prim is not None:
            arrs["instance_of_prim"] = scene.instance_of_prim
    else:
        raise TypeError(f"cannot serialize {type(scene)}")
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrs.items()})


def load_scene(path: str):
    """Load a scene saved with save_scene."""
    z = np.load(path, allow_pickle=False)
    kind = str(z["kind"])
    if kind == "StaticTLAS":
        s = z["statics"]
        return StaticTLAS(
            unified_nodes=jnp.asarray(z["unified_nodes"]),
            instances=Instances(
                transform=jnp.asarray(z["inst_transform"]),
                inv_transform=jnp.asarray(z["inst_inv_transform"]),
                blas_index=jnp.asarray(z["inst_blas_index"]),
                instance_id=jnp.asarray(z["inst_instance_id"]),
                mask=jnp.asarray(z["inst_mask"])),
            prims=_tri_from("prims_", z),
            blas_nodes_offset=jnp.asarray(z["blas_nodes_offset"]),
            blas_prims_offset=jnp.asarray(z["blas_prims_offset"]),
            blas_root_aabb=jnp.asarray(z["blas_root_aabb"]),
            root_aabb=jnp.asarray(z["root_aabb"]),
            n_instances=int(s[0]), instance_capacity=int(s[1]),
            n_blas=int(s[2]))
    if kind == "DenseScene":
        s = z["statics"]
        if "prims_hot" in z:
            hot = jnp.asarray(z["prims_hot"])
            if jnp.issubdtype(hot.dtype, jnp.floating):
                # Legacy f32 rows: vertex floats + bitcast int columns.
                # The new int32 layout IS the old one's bit pattern.
                from ..accel.types import f32_as_i32
                hot = f32_as_i32(hot)
            if hot.shape[1] == 10:   # legacy 10-col rows: prims were in
                # table order, so the original index is the row index
                idx = jnp.arange(hot.shape[0], dtype=jnp.int32)
                hot = jnp.concatenate([hot, idx[:, None]], axis=1)
        else:                        # legacy format: slice the packed rows
            from ..accel.dense import pack_prims_hot
            hot = pack_prims_hot(_tri_from("prims_", z))
        return DenseScene(
            tri_feats=jnp.asarray(z["tri_feats"]),
            cluster_min=jnp.asarray(z["cluster_min"]),
            cluster_max=jnp.asarray(z["cluster_max"]),
            sub_bounds=jnp.asarray(z["sub_bounds"]),
            prims=_tri_from("prims_", z),
            prims_hot=hot,
            root_aabb=jnp.asarray(z["root_aabb"]),
            n_prims=int(s[0]), cluster_size=int(s[1]),
            sub_chunks=int(s[2]) if len(s) > 2 else 4,
            payload_mask=int(s[3]) if len(s) > 3 else 0b111,
            instance_of_prim=(jnp.asarray(z["instance_of_prim"])
                              if "instance_of_prim" in z else None))
    raise ValueError(f"unknown scene kind {kind!r}")
