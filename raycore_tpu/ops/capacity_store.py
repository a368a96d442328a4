"""Persistent per-(scene-shape, engine, query-shape) capacity hints.

The regroup/packed engines auto-size their worklist capacities from one
totals readback and remember the result in process-local caches
(`pallas_regroup._CAPACITY_CACHE` / `_PACKED_CACHE`). That memory is what
`accel.dispatch` consults to auto-route big queries to the fast engines —
but a process-local cache means every FRESH process (the bench driver, any
user script) pays the slow tile-worklist path on query 1 unless it calls
`rc.prewarm` (round-3 verdict weak #6).

This module persists those hints to a small JSON file next to the JAX
persistent compile cache. The disk key drops the process-local
`id(scene.tri_feats)` component: two scenes with the same tri_feats shape
share predictions. That is safe — capacity predictions are validated
post-hoc by every engine (packed totals readback; overflow retries with
doubling; the fused one-dispatch path falls back to two-stage on any
miss), so a stale or wrong hint costs one fallback dispatch, never
correctness. Compiled executables are likewise recovered from the JAX
persistent compile cache (`JAX_COMPILATION_CACHE_DIR`), so a fresh
process with a hint routes to the fast engine and mostly skips the
multi-minute remote stage-graph compile the routing gate was guarding
against.

Disable with RAYCORE_PERSIST_CAPACITY=0.

Reference parity note: the reference has no cross-process state (Julia
recompiles per session); this is TPU-native plumbing for remote-compiler
backends. See VERDICT.md round-3 task 7.
"""
from __future__ import annotations

import json
import os
import threading

_LOCK = threading.Lock()
_LOADED: dict | None = None
_LOADED_PATH: str | None = None


def _enabled() -> bool:
    return os.environ.get("RAYCORE_PERSIST_CAPACITY", "1") != "0"


def _path() -> str | None:
    if not _enabled():
        return None
    d = os.environ.get("RAYCORE_CAPACITY_DIR") \
        or os.environ.get("JAX_COMPILATION_CACHE_DIR") \
        or "/tmp/jax_cache_tpu"
    return os.path.join(d, "raycore_capacity_hints.json")


def _load() -> dict:
    global _LOADED, _LOADED_PATH
    p = _path()
    if p is None:
        return {}
    with _LOCK:
        if _LOADED is not None and _LOADED_PATH == p:
            return _LOADED
        try:
            with open(p) as f:
                _LOADED = json.load(f)
        except (OSError, ValueError):
            _LOADED = {}
        _LOADED_PATH = p
        return _LOADED


_FP_CACHE: dict = {}


def scene_fingerprint(scene) -> str:
    """Cheap content fingerprint: the scene's root AABB bytes + padded
    feats shape. Two scenes with the same SHAPES but different geometry
    (the 1M heightfield and the 1M blobby both pad to (8192, 16, 512))
    must NOT share persisted capacity hints: hints are sticky-max and
    never shrink, so the denser scene's counts would permanently inflate
    the sparser scene's worklist capacities — measured as the r4
    4.64-vs-7.57 Mrays/s headline discrepancy (226 ms with blobby-
    polluted hints vs 138 ms with scene-true ones). One tiny device
    readback per scene per process, cached by id with a weakref
    staleness guard."""
    key = id(scene.tri_feats)
    ent = _FP_CACHE.get(key)
    if ent is not None:
        ref, fp = ent
        if ref is None or ref() is scene.tri_feats:
            return fp
        del _FP_CACHE[key]
    import hashlib
    import weakref
    import numpy as np
    raw = np.asarray(scene.root_aabb, np.float32).tobytes()
    fp = hashlib.sha1(raw).hexdigest()[:12]
    try:
        ref = weakref.ref(scene.tri_feats)
    except TypeError:
        ref = None
    if len(_FP_CACHE) > 256:
        _FP_CACHE.pop(next(iter(_FP_CACHE)))
    _FP_CACHE[key] = (ref, fp)
    return fp


def persist_key(ck: tuple, scene=None) -> str:
    """Disk key for an engine cache key: drop the leading process-local
    id(), keep everything shape/param-shaped, tag with the backend (a
    CPU-interpret warmup must not convince a TPU process it is warm)
    and with the scene's content fingerprint (see scene_fingerprint)."""
    import jax
    fp = scene_fingerprint(scene) if scene is not None else ""
    return repr((jax.default_backend(), fp) + tuple(ck[1:]))


def load_hint(ck: tuple, scene=None) -> dict | None:
    """Persisted capacity fields for this key, or None."""
    ent = _load().get(persist_key(ck, scene))
    return dict(ent) if isinstance(ent, dict) else None


def save_hint(ck: tuple, ent: dict, scene=None) -> None:
    """Write-through one hint (sticky-max merge with what's on disk).
    Last-writer-wins across processes; hints are advisory so a lost
    update is harmless."""
    p = _path()
    if p is None:
        return
    fields = {k: int(v) for k, v in ent.items()
              if isinstance(v, (int, float)) and k != "ref"}
    if not fields:
        return
    pk = persist_key(ck, scene)
    with _LOCK:
        try:
            try:
                with open(p) as f:
                    cur = json.load(f)
            except (OSError, ValueError):
                cur = {}
            old = cur.get(pk)
            if isinstance(old, dict):
                for k, v in old.items():
                    if isinstance(v, (int, float)):
                        fields[k] = max(fields.get(k, 0), int(v))
            if old == fields:
                return
            cur[pk] = fields
            if len(cur) > 512:      # FIFO bound, mirrors the RAM caches
                for k in list(cur)[:len(cur) - 512]:
                    del cur[k]
            os.makedirs(os.path.dirname(p), exist_ok=True)
            tmp = p + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(cur, f)
            os.replace(tmp, p)
            global _LOADED, _LOADED_PATH
            _LOADED, _LOADED_PATH = cur, p
        except OSError:
            pass
