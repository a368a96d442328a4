"""Decompose the PERM-ONLY dense build (the current default path) on the
real TPU: pack_hot -> axes readback -> perm sorts -> hot gather ->
featurize+pack -> payload flags. Value-dependent readbacks throughout.

Usage: python tools/profile_build2.py [n_tris] [layout]
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
from raycore_tpu.accel import dense as D
from raycore_tpu.accel import lbvh
from raycore_tpu.accel.types import next_pow2


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    leaf = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")][0]
    probe = jax.jit(lambda a: jnp.sum(a.reshape(-1)[::4097].astype(jnp.float32)))
    float(probe(leaf))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = [x for x in jax.tree_util.tree_leaves(out)
                if hasattr(x, "dtype")][0]
        float(probe(leaf))
        ts.append(time.perf_counter() - t0)
    print(f"  {label:40s} {min(ts)*1e3:8.2f} ms", flush=True)
    return out


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    layout = sys.argv[2] if len(sys.argv) > 2 else "tiles"
    grid_n = int(np.sqrt(n_target / 2))
    mesh = rc.displaced_grid_mesh(n=grid_n, extent=2.0, amplitude=0.35)
    n = mesh.vertices.shape[0]
    cap = max(next_pow2(n), 128)
    print(f"{n} tris, capacity {cap}, layout={layout}", flush=True)

    # no-op dispatch floor
    nop = jax.jit(lambda a: a[::4097].sum())
    x = jnp.arange(cap, dtype=jnp.float32)
    float(nop(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(nop(x))
        ts.append(time.perf_counter() - t0)
    print(f"  {'dispatch+readback floor':40s} {min(ts)*1e3:8.2f} ms",
          flush=True)

    hot0 = timed("pack_hot_padded", lambda: D._pack_hot_padded(
        mesh.vertices, mesh.metadata, cap))

    t0 = time.perf_counter()
    axes, s0, s1 = lbvh.tile_sort_axes(mesh.vertices, cap, 128)
    print(f"  {'tile_sort_axes (host sync)':40s} "
          f"{(time.perf_counter() - t0)*1e3:8.2f} ms", flush=True)

    vp = hot0[:, :9].reshape(cap, 3, 3)
    perm = timed("tile_perm_padded (3 sorts)", jax.jit(
        lambda v: lbvh.tile_perm_padded(v, axes=axes, s0=s0, s1=s1)), vp)
    timed("morton_perm_padded (1 sort)", jax.jit(lbvh.morton_perm_padded), vp)

    key = jnp.arange(cap, dtype=jnp.int32)
    timed("one lax.sort (i32 key + i32 payload)", jax.jit(
        lambda k: jax.lax.sort((k, key), num_keys=1, is_stable=True)), key)

    hot = timed("hot gather (cap, 11)", jax.jit(
        lambda h, p: jnp.take(h, p, axis=0)), hot0, perm)

    timed("featurize+pack tables", jax.jit(
        lambda h: D._dense_tables_from_hot(h, 128, 1)), hot)

    timed("payload flags (3 jnp.any)", lambda: D._payload_flags(
        mesh.normals, mesh.tangents, mesh.uv))

    t0 = time.perf_counter()
    sc = D.build_dense(mesh, cluster_size=128, layout=layout)
    float(sc.tri_feats[0, 0, 0])
    print(f"  {'full build_dense warm #1':40s} "
          f"{(time.perf_counter() - t0)*1e3:8.2f} ms", flush=True)
    t0 = time.perf_counter()
    sc = D.build_dense(mesh, cluster_size=128, layout=layout)
    float(sc.tri_feats[0, 0, 0])
    print(f"  {'full build_dense warm #2':40s} "
          f"{(time.perf_counter() - t0)*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
