"""ctypes bindings for the C++ runtime library (sln_tpu/cpp/native.cpp).

Auto-builds libsln_native.so on first use (g++ is part of the toolchain);
every entry point has a pure-Python fallback so the package works without a
compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libsln_native.so")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.isfile(_LIB_PATH):
        try:
            subprocess.run(["sh", os.path.join(_CPP_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception as e:  # no compiler / build failure -> fallbacks
            print(f"sln_native build failed ({e}); using Python fallbacks")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        print(f"sln_native load failed ({e}); using Python fallbacks")
        return None

    lib.split_long_edges.restype = ctypes.c_int
    lib.split_long_edges.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64)]
    lib.cuboid_iou.restype = ctypes.c_double
    lib.cuboid_iou.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_double]
    lib.count_top_level_keys.restype = ctypes.c_int64
    lib.count_top_level_keys.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.pack_rooms_json.restype = ctypes.c_int64
    lib.pack_rooms_json.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
    lib.native_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
def split_long_edges(verts: np.ndarray, faces: np.ndarray,
                     max_len: float) -> Tuple[np.ndarray, np.ndarray]:
    """Subdivide triangles until all edges <= max_len.

    Returns (verts (3T, 3) float32, faces (T, 3) int32) as unwelded
    triangle soup — the role of pymesh.split_long_edges_raw
    (reference models/misc.py:79) for the rasterizer's benefit.
    """
    lib = _load()
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    if lib is not None:
        out_v = ctypes.POINTER(ctypes.c_float)()
        out_n = ctypes.c_int64()
        rc = lib.split_long_edges(
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(verts),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(faces), max_len, ctypes.byref(out_v), ctypes.byref(out_n))
        if rc == 0:
            n = out_n.value
            v = np.ctypeslib.as_array(out_v, shape=(3 * n, 3)).copy()
            lib.native_free(out_v)
            f = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
            return v, f
    return _split_long_edges_py(verts, faces, max_len)


def _split_long_edges_py(verts, faces, max_len):
    max2 = max_len * max_len
    out = []

    def rec(a, b, c, depth):
        ab = ((a - b) ** 2).sum()
        bc = ((b - c) ** 2).sum()
        ca = ((c - a) ** 2).sum()
        if depth <= 0 or (ab <= max2 and bc <= max2 and ca <= max2):
            out.extend([a, b, c])
            return
        if ab >= bc and ab >= ca:
            m = (a + b) / 2
            rec(a, m, c, depth - 1)
            rec(m, b, c, depth - 1)
        elif bc >= ab and bc >= ca:
            m = (b + c) / 2
            rec(a, b, m, depth - 1)
            rec(a, m, c, depth - 1)
        else:
            m = (c + a) / 2
            rec(a, b, m, depth - 1)
            rec(m, b, c, depth - 1)

    for f in faces:
        rec(verts[f[0]], verts[f[1]], verts[f[2]], 24)
    v = np.asarray(out, np.float32)
    return v, np.arange(len(v), dtype=np.int32).reshape(-1, 3)


# ---------------------------------------------------------------------------
def cuboid_iou(quad1: np.ndarray, y1: Tuple[float, float],
               quad2: np.ndarray, y2: Tuple[float, float]) -> float:
    """Host-side rotated-cuboid IoU (reference test_utils.py:33-40)."""
    lib = _load()
    q1 = np.ascontiguousarray(quad1, np.float64).reshape(8)
    q2 = np.ascontiguousarray(quad2, np.float64).reshape(8)
    if lib is not None:
        return float(lib.cuboid_iou(
            q1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            y1[0], y1[1],
            q2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            y2[0], y2[1]))
    import jax.numpy as jnp

    from sln_tpu.ops.iou import cuboid_iou as jiou
    return float(jiou(jnp.asarray(quad1), y1[0], y1[1],
                      jnp.asarray(quad2), y2[0], y2[1]))


# ---------------------------------------------------------------------------
def count_top_level_keys(json_text: str) -> int:
    """Number of keys at depth 1 of a JSON object (= rooms in the
    reference schema). C++ scan when available, pure-Python otherwise."""
    data = json_text.encode("utf-8")
    lib = _load()
    if lib is not None:
        return int(lib.count_top_level_keys(data, len(data)))
    count, depth, i, n = 0, 0, 0, len(data)
    while i < n:
        c = data[i]
        if c == 0x22:  # '"'
            i += 1
            while i < n and data[i] != 0x22:
                i += 2 if data[i] == 0x5C else 1
            i += 1
            if depth == 1:
                while i < n and data[i] in b" \t\n\r":
                    i += 1
                if i < n and data[i] == 0x3A:  # ':'
                    count += 1
            continue
        if c in b"{[":
            depth += 1
        elif c in b"}]":
            depth -= 1
        i += 1
    return count


def pack_rooms(json_text: str, max_objects: int,
               max_rooms: int = 1 << 20) -> Optional[Dict[str, np.ndarray]]:
    """C++ JSON scene packer; returns the tensorize_rooms array dict or
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from sln_tpu.data.vocab import OBJECT_IDX_TO_NAME

    data = json_text.encode("utf-8")
    # exact room count = top-level keys (one key per room in the reference
    # schema); counting every '":' here over-allocated ~room_count x
    # objects_per_room arrays on real metadata files
    est = min(int(lib.count_top_level_keys(data, len(data))) + 1, max_rooms)
    est = max(est, 1)
    O = max_objects
    objs = np.zeros((est, O), np.int32)
    boxes = np.zeros((est, O, 6), np.float32)
    angles = np.zeros((est, O), np.int32)
    mask = np.zeros((est, O), np.uint8)
    room_ids = np.zeros((est,), np.int32)
    names = "\n".join(OBJECT_IDX_TO_NAME).encode("utf-8")
    n = lib.pack_rooms_json(
        data, len(data), names, O,
        objs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        angles.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        room_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), est)
    if n < 0:
        return None
    n = int(n)
    return {"objs": objs[:n], "boxes": boxes[:n], "angles": angles[:n],
            "obj_mask": mask[:n].astype(bool), "room_ids": room_ids[:n]}
