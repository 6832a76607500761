"""Native (C++) host components with pure-Python fallbacks.

The reference's host runtime is native Rust; this framework's host-side
heavy lifting — BVH building and mesh IO — is native C++ (``native/``)
bound via ctypes, with Python fallbacks so nothing hard-depends on the
toolchain. ``build_native()`` compiles the shared library on demand with
``make``.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import NamedTuple, Optional, Tuple

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmrt_native.so"
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


class FlatBVH(NamedTuple):
    """Flat skip-link BVH (depth-first node order).

    Traversal contract: at node ``i``, on a bbox hit descend to ``i+1``
    (or iterate the leaf primitives ``order[first:first+count]``), then
    continue at ``skip[i]``; on a miss jump to ``skip[i]``; finish when the
    cursor reaches ``len(count)``.
    """

    nodes_min: np.ndarray  # [M, 3] f32
    nodes_max: np.ndarray  # [M, 3] f32
    first: np.ndarray  # [M] i32 (valid when count > 0)
    count: np.ndarray  # [M] i32 (0 = interior)
    skip: np.ndarray  # [M] i32
    order: np.ndarray  # [P] i32 primitive permutation


def build_native(quiet: bool = True) -> bool:
    """Compile native/libmrt_native.so; returns success."""
    try:
        # Only the library target: a failure building the unrelated
        # benchmark binary must not disable a working libmrt_native.so.
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR), _LIB_PATH.name],
            check=True,
            capture_output=quiet,
        )
    except (OSError, subprocess.CalledProcessError):
        pass
    return _LIB_PATH.exists()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not _LIB_PATH.exists() and not build_native():
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _lib_failed = True
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.mrt_build_bvh.restype = ctypes.c_int
    lib.mrt_build_bvh.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int,
        f32p, f32p, i32p, i32p, i32p, i32p,
    ]
    lib.mrt_obj_open.restype = ctypes.c_int
    lib.mrt_obj_open.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.mrt_obj_read.restype = ctypes.c_int
    lib.mrt_obj_read.argtypes = [f32p, i32p]
    lib.mrt_obj_free.restype = None
    lib.mrt_obj_free.argtypes = []
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def build_bvh(
    prim_min: np.ndarray,
    prim_max: np.ndarray,
    max_leaf: int = 4,
    force_python: bool = False,
) -> FlatBVH:
    """Build a flat skip-link BVH over primitive AABBs.

    Uses the native binned-SAH builder when available, else the Python
    median-split fallback (same output contract, different tree shape).
    """
    prim_min = np.ascontiguousarray(prim_min, np.float32)
    prim_max = np.ascontiguousarray(prim_max, np.float32)
    n = prim_min.shape[0]
    assert prim_min.shape == (n, 3) and prim_max.shape == (n, 3)

    lib = None if force_python else _load()
    if lib is not None:
        cap = 2 * n
        nodes_min = np.empty((cap, 3), np.float32)
        nodes_max = np.empty((cap, 3), np.float32)
        first = np.empty(cap, np.int32)
        count = np.empty(cap, np.int32)
        skip = np.empty(cap, np.int32)
        order = np.empty(n, np.int32)
        m = lib.mrt_build_bvh(
            prim_min, prim_max, n, int(max_leaf),
            nodes_min, nodes_max, first, count, skip, order,
        )
        if m > 0:
            return FlatBVH(
                nodes_min[:m].copy(), nodes_max[:m].copy(),
                first[:m].copy(), count[:m].copy(), skip[:m].copy(), order,
            )
    from myraytracer_tpu.native.bvh_py import build_bvh_python

    return build_bvh_python(prim_min, prim_max, max_leaf)


def load_obj(path, force_python: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Load an OBJ file → (vertices [V,3] f32, triangles [T,3] i32)."""
    lib = None if force_python else _load()
    if lib is not None:
        nv = ctypes.c_int()
        nt = ctypes.c_int()
        rc = lib.mrt_obj_open(str(path).encode(), ctypes.byref(nv), ctypes.byref(nt))
        if rc == 0:
            vertices = np.empty((nv.value, 3), np.float32)
            triangles = np.empty((nt.value, 3), np.int32)
            lib.mrt_obj_read(vertices, triangles)
            lib.mrt_obj_free()
            return vertices, triangles
        if rc == -1:
            raise FileNotFoundError(path)
    from myraytracer_tpu.native.obj_py import load_obj_python

    return load_obj_python(path)
