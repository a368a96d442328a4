"""SoA and unrolled-iteration utilities.

Counterpart of the reference's GPU-safe generic-programming layer
(reference: src/soa.jl and src/unrolled.jl). Most of that layer exists to
work around Julia/GPU compiler limits and disappears here by construction
(SURVEY.md §2.5):

- `@get`/`@set`/`similar_soa` — JAX arrays are already SoA; provided as
  plain functions over dicts/pytrees of arrays.
- `FastClosure`/`for_unrolled`/`map_unrolled`/`reduce_unrolled` — Python
  loops unroll at trace time; thin wrappers are provided for API parity.
- `getindex_unrolled` (runtime index into a heterogeneous tuple) — the one
  piece with real semantics left: `switch_apply` = `lax.switch`.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp


def soa_get(soa: dict, idx, *fields):
    """`@get f1,f2 = soa[i]` (reference src/soa.jl:22-60): per-field array
    indexing on a dict-of-arrays. Returns a tuple (or scalar for one field)."""
    out = tuple(soa[f][idx] for f in fields)
    return out[0] if len(out) == 1 else out


def soa_set(soa: dict, idx, **values):
    """`@set soa[i] = (f=v, ...)` — functional: returns the updated dict
    (arrays are immutable in JAX)."""
    out = dict(soa)
    for f, v in values.items():
        out[f] = out[f].at[idx].set(v)
    return out


def similar_soa(template: dict, n: int, dtypes=None) -> dict:
    """Allocate a same-field dict of zeros with leading dim n (reference
    similar_soa, src/soa.jl:62-110)."""
    out = {}
    for f, a in template.items():
        dt = dtypes.get(f) if dtypes else a.dtype
        out[f] = jnp.zeros((n,) + a.shape[1:], dt)
    return out


def for_unrolled(fn: Callable, items: Sequence) -> None:
    """Trace-time unrolled iteration (reference for_unrolled)."""
    for i, it in enumerate(items):
        fn(i, it)


def map_unrolled(fn: Callable, items: Sequence) -> tuple:
    return tuple(fn(it) for it in items)


def reduce_unrolled(fn: Callable, items: Sequence, init):
    acc = init
    for it in items:
        acc = fn(acc, it)
    return acc


def sum_unrolled(fn: Callable, items: Sequence):
    return reduce_unrolled(lambda a, it: a + fn(it), items, 0.0)


def switch_apply(idx, fns_or_items: Sequence, *args):
    """Runtime index into a heterogeneous tuple (reference
    getindex_unrolled's if-chain, src/unrolled.jl:293-322) = lax.switch.
    Items may be callables (invoked with *args) or values (returned)."""
    items = list(fns_or_items)
    if items and callable(items[0]):
        branches = [lambda a, f=f: f(*a) for f in items]
        return jax.lax.switch(jnp.clip(jnp.asarray(idx, jnp.int32), 0,
                                       len(items) - 1), branches, args)
    branches = [lambda _, v=v: v for v in items]
    return jax.lax.switch(jnp.clip(jnp.asarray(idx, jnp.int32), 0,
                                   len(items) - 1), branches, ())
