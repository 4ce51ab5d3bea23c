"""ctypes bindings to the C++ host runtime (native/tpurt_native.cpp).

The reference's host tier is native code (SURVEY.md §0); tpurt keeps its
host-side hot paths native too: OBJ parsing, PNG encoding, and the
packet-BVH topology build. Every entry point has a pure-Python twin that is
both the fallback (no toolchain → still fully functional) and the
differential-test oracle (tests/unit/test_native.py).

The shared library is compiled on first use with g++ (cached in
native/build/); set TPURT_NO_NATIVE=1 to force the Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
_SRC = os.path.join(_REPO, "native", "tpurt_native.cpp")
_SO = os.path.join(_REPO, "native", "build", "libtpurt_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _SO, "-lz"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it if needed; None if disabled
    or unbuildable (callers fall back to Python)."""
    global _lib, _tried
    if os.environ.get("TPURT_NO_NATIVE") == "1":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        lib.tpurt_png_write.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, u8p
        ]
        lib.tpurt_png_write.restype = ctypes.c_int
        lib.tpurt_obj_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int, i32p, i32p, i32p, f32p, f32p,
            i32p, i32p, i32p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int32,
        ]
        lib.tpurt_obj_parse.restype = ctypes.c_int
        lib.tpurt_bvh_build.argtypes = [
            ctypes.c_int32, f32p, f32p, f32p, f32p, i32p, i32p, i32p
        ]
        lib.tpurt_bvh_build.restype = ctypes.c_int32
        _lib = lib
        return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def png_write(path: str, image_u8: np.ndarray) -> bool:
    """Native PNG encode; returns False if unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return False
    img = np.ascontiguousarray(image_u8)
    h, w, _ = img.shape
    rc = lib.tpurt_png_write(
        path.encode(), w, h,
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return rc == 0


def obj_parse(path: str):
    """Native OBJ geometry parse.

    Returns (verts (V,3) f32, normals (N,3) f32, tri_v (T,3) i32,
    tri_n (T,3) i32 with -1 for none, face_mat (T,) i32 usemtl-slot,
    mtl_names list[str], mtllib str) or None if unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    nv = ctypes.c_int32()
    nn = ctypes.c_int32()
    nt = ctypes.c_int32()
    null_f = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    null_i = ctypes.cast(None, ctypes.POINTER(ctypes.c_int32))
    rc = lib.tpurt_obj_parse(
        path.encode(), 1, ctypes.byref(nv), ctypes.byref(nn),
        ctypes.byref(nt), null_f, null_f, null_i, null_i, null_i,
        None, 0, None, 0,
    )
    if rc != 0:
        return None
    verts = np.empty((nv.value, 3), np.float32)
    normals = np.empty((nn.value, 3), np.float32)
    tri_v = np.empty((nt.value, 3), np.int32)
    tri_n = np.empty((nt.value, 3), np.int32)
    face_mat = np.empty((nt.value,), np.int32)
    names = ctypes.create_string_buffer(1 << 16)
    mtllib = ctypes.create_string_buffer(4096)
    rc = lib.tpurt_obj_parse(
        path.encode(), 0, ctypes.byref(nv), ctypes.byref(nn),
        ctypes.byref(nt), _fp(verts), _fp(normals), _ip(tri_v), _ip(tri_n),
        _ip(face_mat), names, len(names), mtllib, len(mtllib),
    )
    if rc != 0:
        return None
    name_list = names.value.decode(errors="replace")
    return (
        verts, normals, tri_v, tri_n, face_mat,
        name_list.split("\n") if name_list else [],
        mtllib.value.decode(errors="replace"),
    )


def bvh_build(bmin: np.ndarray, bmax: np.ndarray):
    """Native median-split BVH topology; None if unavailable.

    Returns (bmin (M,3), bmax (M,3), first (M,), count (M,), skip (M,))
    with M = 2n-1 preorder nodes — same contract as the Python builder in
    tpurt.bvh.cluster._median_split_tree.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = bmin.shape[0]
    cap = max(2 * n - 1, 1)
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    o_bmin = np.empty((cap, 3), np.float32)
    o_bmax = np.empty((cap, 3), np.float32)
    o_first = np.empty(cap, np.int32)
    o_count = np.empty(cap, np.int32)
    o_skip = np.empty(cap, np.int32)
    m = lib.tpurt_bvh_build(
        n, _fp(bmin), _fp(bmax), _fp(o_bmin), _fp(o_bmax),
        _ip(o_first), _ip(o_count), _ip(o_skip),
    )
    if m <= 0:
        return None
    return o_bmin[:m], o_bmax[:m], o_first[:m], o_count[:m], o_skip[:m]
