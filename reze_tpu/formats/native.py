"""ctypes bindings for the native asset-pipeline kernels (native/*.cpp).

The shared library is built on demand with g++ and cached next to the
sources; every entry point has a pure-Python fallback, so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libreze_native.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "reze_native.cpp")

_lib = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.reze_parse_pmx_vertices.restype = ctypes.c_longlong
        lib.reze_parse_vmd_bone_frames.restype = ctypes.c_longlong
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def parse_pmx_vertices(
    data: bytes, offset: int, vertex_count: int, add_uv_count: int, bone_index_size: int
):
    """Native PMX vertex-block parse; returns None if the library is
    unavailable, else a dict of arrays + the end offset."""
    lib = _load()
    if lib is None or vertex_count <= 0:
        return None
    n = vertex_count
    positions = np.empty((n, 3), np.float32)
    normals = np.empty((n, 3), np.float32)
    uvs = np.empty((n, 2), np.float32)
    add_uvs = np.zeros((n, max(add_uv_count, 1), 4), np.float32)
    deform_types = np.empty(n, np.uint8)
    joints = np.empty((n, 4), np.int32)
    weights = np.empty((n, 4), np.float32)
    sdef_c = np.zeros((n, 3), np.float32)
    sdef_r0 = np.zeros((n, 3), np.float32)
    sdef_r1 = np.zeros((n, 3), np.float32)
    edge_scale = np.empty(n, np.float32)
    has_sdef = ctypes.c_int(0)
    buf = np.frombuffer(data, np.uint8)
    end = lib.reze_parse_pmx_vertices(
        _ptr(buf), ctypes.c_longlong(len(data)), ctypes.c_longlong(offset),
        n, add_uv_count, bone_index_size,
        _ptr(positions), _ptr(normals), _ptr(uvs), _ptr(add_uvs),
        _ptr(deform_types), _ptr(joints), _ptr(weights),
        _ptr(sdef_c), _ptr(sdef_r0), _ptr(sdef_r1), _ptr(edge_scale),
        ctypes.byref(has_sdef),
    )
    if end < 0:
        return None
    return {
        "positions": positions,
        "normals": normals,
        "uvs": uvs,
        "additional_uvs": add_uvs if add_uv_count else None,
        "deform_types": deform_types,
        "joints4": joints,
        "weights4": weights,
        "sdef": (sdef_c, sdef_r0, sdef_r1) if has_sdef.value else None,
        "edge_scale": edge_scale,
        "end": int(end),
    }


def parse_vmd_bone_frames(data: bytes, offset: int, n: int):
    lib = _load()
    if lib is None or n <= 0:
        return None
    names = np.empty((n, 15), np.uint8)
    frames = np.empty(n, np.uint32)
    positions = np.empty((n, 3), np.float32)
    rotations = np.empty((n, 4), np.float32)
    interp = np.empty((n, 16), np.uint8)
    buf = np.frombuffer(data, np.uint8)
    end = lib.reze_parse_vmd_bone_frames(
        _ptr(buf), ctypes.c_longlong(len(data)), ctypes.c_longlong(offset),
        n, _ptr(names), _ptr(frames), _ptr(positions), _ptr(rotations), _ptr(interp),
    )
    if end < 0:
        return None
    return {
        "names": names,
        "frames": frames,
        "positions": positions,
        "rotations": rotations,
        "interp": interp,
        "end": int(end),
    }
