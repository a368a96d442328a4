"""Decompose dense-build time on the real TPU (VERDICT r1 #4: warm build
335 ms at 1M tris vs reference GPU 7.46 ms; target <=30 ms).

Stages timed separately with value-dependent readbacks:
  pad -> morton/tile sort keys -> SoA permute -> featurize+pack.

Usage: python tools/profile_build.py [n_tris] [layout]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np

import raycore_tpu as rc
from raycore_tpu.accel.dense import _build_dense, build_dense
from raycore_tpu.accel import lbvh
from raycore_tpu.accel.types import next_pow2


def timed(label, fn, *args, reps=3, probe=None):
    out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    pr = probe or (lambda o: float(
        jnp.sum(jax.tree_util.tree_leaves(o)[0].reshape(-1)[::4097]
                .astype(jnp.float32))))
    pr(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        pr(out)
        ts.append(time.perf_counter() - t0)
    print(f"  {label:34s} {min(ts)*1e3:8.2f} ms")
    return out


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    layout = sys.argv[2] if len(sys.argv) > 2 else "tiles"
    grid_n = int(np.sqrt(n_target / 2))
    mesh = rc.displaced_grid_mesh(n=grid_n, extent=2.0, amplitude=0.35)
    n = mesh.vertices.shape[0]
    cap = max(next_pow2(n), 128)
    print(f"{n} tris, capacity {cap}, layout={layout}")

    padded = timed("pad_triangles", jax.jit(
        lambda t: lbvh.pad_triangles(t, cap)), mesh)

    if layout == "tiles":
        sorted_tris = timed(
            "tile_sort (keys + SoA permute)",
            lambda t: lbvh.tile_sort_triangles(t, cap, 128), mesh)
    else:
        sorted_tris = timed(
            "morton_sort (keys + SoA permute)",
            lambda t: lbvh.morton_sort_triangles(t, cap), mesh)

    # Permute alone (hot: what a key-only sort leaves behind).
    perm = jnp.flip(jnp.arange(cap, dtype=jnp.int32))
    take_all = jax.jit(lambda t, p: jax.tree_util.tree_map(
        lambda a: jnp.take(a, p, axis=0), t))
    timed("SoA permute (5 field gathers)", take_all, padded, perm)

    def take_fused(t, p):
        flat = jnp.concatenate([
            t.vertices.reshape(cap, 9), t.normals.reshape(cap, 9),
            t.tangents.reshape(cap, 9), t.uv.reshape(cap, 6),
            t.metadata.astype(jnp.float32)[:, None]], axis=1)
        g = jnp.take(flat, p, axis=0)
        from raycore_tpu.core.triangle import Triangle
        return Triangle(
            vertices=g[:, 0:9].reshape(cap, 3, 3),
            normals=g[:, 9:18].reshape(cap, 3, 3),
            tangents=g[:, 18:27].reshape(cap, 3, 3),
            uv=g[:, 27:33].reshape(cap, 3, 2),
            metadata=g[:, 33].astype(jnp.uint32))
    timed("SoA permute (one fused gather)", jax.jit(take_fused),
          padded, perm)

    timed("featurize+pack (_build_dense)",
          lambda t: _build_dense(t, 128, 1), sorted_tris)
    timed("featurize+pack sub_chunks=4",
          lambda t: _build_dense(t, 128, 4), sorted_tris)

    t0 = time.perf_counter()
    sc = build_dense(mesh, cluster_size=128, layout=layout)
    float(sc.tri_feats[0, 0, 0])
    print(f"  {'full build_dense (warm e2e)':34s} "
          f"{(time.perf_counter() - t0)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
