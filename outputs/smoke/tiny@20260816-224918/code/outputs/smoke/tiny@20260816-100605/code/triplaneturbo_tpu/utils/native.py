"""ctypes bindings for the native (C++) runtime components.

The compute path is JAX/XLA/Pallas; host-side runtime pieces that the
reference implements natively (or that are Python-formatting-bound, like OBJ
serialization of 500k-element meshes) live in ``native/`` as C++ and bind via
ctypes — no pybind11 required. Builds on demand with g++ when the shared
object is missing; callers fall back to the pure-Python path when no
toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libobjwriter.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.write_obj.restype = ctypes.c_int
    lib.write_obj.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.compact_mesh.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def _ptr(a: Optional[np.ndarray], ctype):
    if a is None:
        return ctypes.POINTER(ctype)()
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def write_obj_native(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    colors: Optional[np.ndarray] = None,
    v_mask: Optional[np.ndarray] = None,
    t_mask: Optional[np.ndarray] = None,
) -> bool:
    """Write a (masked, vertex-colored) OBJ via the C++ writer.

    Returns False when the native library is unavailable (caller should fall
    back to the Python writer).
    """
    lib = _load()
    if lib is None:
        return False
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    colors = None if colors is None else np.ascontiguousarray(np.clip(colors, 0, 1), np.float32)
    vm = None if v_mask is None else np.ascontiguousarray(v_mask, np.uint8)
    fm = None if t_mask is None else np.ascontiguousarray(t_mask, np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rc = lib.write_obj(
        path.encode(),
        _ptr(verts, ctypes.c_float), _ptr(colors, ctypes.c_float),
        _ptr(faces, ctypes.c_int32),
        _ptr(vm, ctypes.c_uint8), _ptr(fm, ctypes.c_uint8),
        verts.shape[0], faces.shape[0],
    )
    return rc == 0
