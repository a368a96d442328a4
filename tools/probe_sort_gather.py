"""Probe: permute 1M 140B rows by (a) take-gather, (b) payload-carrying
lax.sort, (c) narrow take-gathers of varying width — to pick the dense
build's data-movement strategy (VERDICT r1 #4).

Usage: python tools/probe_sort_gather.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    probe = jax.jit(lambda x: x.reshape(-1)[::4097].astype(jnp.float32).sum())
    float(probe(leaf))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(probe(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    print(f"  {label:44s} {min(ts)*1e3:8.2f} ms")
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    data = jnp.asarray(rng.standard_normal((n, 35), dtype=np.float32))
    print(f"{n} rows x 140 B")

    timed("take (n,35) f32", jax.jit(
        lambda d, p: jnp.take(d, p, axis=0)), data, perm)
    timed("take (n,9) f32", jax.jit(
        lambda d, p: jnp.take(d[:, :9], p, axis=0)), data, perm)
    timed("take (n,1) f32", jax.jit(
        lambda d, p: jnp.take(d[:, 0], p)), data, perm)

    @jax.jit
    def sort_payload(k, d):
        ops = (k,) + tuple(d[:, i] for i in range(35))
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        return jnp.stack(out[1:], axis=1)
    timed("lax.sort 1 key + 35 f32 payload cols", sort_payload, keys, data)

    @jax.jit
    def sort_perm_only(k):
        order = jnp.arange(k.shape[0], dtype=jnp.int32)
        return jax.lax.sort((k, order), num_keys=1, is_stable=True)[1]
    timed("lax.sort 1 key + 1 i32 payload (perm)", sort_perm_only, keys)

    @jax.jit
    def sort_then_take(k, d):
        order = jnp.arange(k.shape[0], dtype=jnp.int32)
        p = jax.lax.sort((k, order), num_keys=1, is_stable=True)[1]
        return jnp.take(d, p, axis=0)
    timed("sort perm + take (n,35)", sort_then_take, keys, data)

    # Histogram for quantile keys: bincount of 256 buckets over n values.
    @jax.jit
    def hist(k):
        b = (k >> 22).astype(jnp.int32)
        return jnp.bincount(b, length=256)
    timed("bincount 256 buckets", hist, keys)


if __name__ == "__main__":
    main()
