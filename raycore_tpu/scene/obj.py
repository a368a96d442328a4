"""Wavefront OBJ loading: native C++ parser with a NumPy fallback.

The reference relies on Julia's GeometryBasics mesh types for ingestion;
here mesh IO is part of the framework. The hot parser is ~100 lines of C++
(native/objloader.cpp) built on demand with g++ and bound via ctypes (this
image ships no pybind11); if the toolchain is unavailable the pure-NumPy
fallback parses the same subset (v/vn/f with fan triangulation and
relative indices).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..core.triangle import Triangle
from .mesh import build_triangles

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LOCK = threading.Lock()
_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    with _LOCK:
        if _LIB_TRIED:
            return _LIB
        _LIB_TRIED = True
        src = os.path.join(_NATIVE_DIR, "objloader.cpp")
        so = os.path.join(_NATIVE_DIR, "libobjloader.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            lib.obj_count.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_long),
                                      ctypes.POINTER(ctypes.c_long)]
            lib.obj_count.restype = ctypes.c_int
            lib.obj_parse.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_float)]
            lib.obj_parse.restype = ctypes.c_int
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def _parse_obj_native(path: str):
    lib = _load_native()
    if lib is None:
        return None
    nv = ctypes.c_long()
    nf = ctypes.c_long()
    if lib.obj_count(path.encode(), ctypes.byref(nv), ctypes.byref(nf)) != 0:
        raise FileNotFoundError(path)
    verts = np.empty((nv.value, 3), np.float32)
    faces = np.empty((nf.value, 3), np.int32)
    normals = np.empty((nv.value, 3), np.float32)
    rc = lib.obj_parse(
        path.encode(),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        normals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"obj_parse failed with code {rc}")
    if not normals.any():
        normals = None
    return verts, faces, normals


def _parse_obj_python(path: str):
    verts, normals, faces = [], [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vn "):
                normals.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(2, len(idx)):
                    faces.append([idx[0], idx[k - 1], idx[k]])
    v = np.asarray(verts, np.float32)
    n = np.asarray(normals, np.float32) if len(normals) == len(verts) \
        else None
    return v, np.asarray(faces, np.int64), n


def load_obj(path: str, metadata=None, native: bool | None = None) -> Triangle:
    """Load an OBJ file into a Triangle SoA (native parser when available)."""
    parsed = _parse_obj_native(path) if native in (None, True) else None
    if parsed is None:
        if native is True:
            raise RuntimeError("native OBJ loader unavailable")
        parsed = _parse_obj_python(path)
    verts, faces, normals = parsed
    return build_triangles(verts, faces, normals=normals, metadata=metadata)
