"""Native runtime bindings (C++ batch packer via ctypes).

Builds ``packer.cpp`` with the system ``g++`` on first use (cached as
``libtraj_packer.so`` next to the source) and exposes the C ABI through
ctypes.  Falls back gracefully: callers check :func:`available` and use
the numpy path when the toolchain or library is missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "packer.cpp")
_LIB = os.path.join(_DIR, "libtraj_packer.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    # compile to a process-unique temp then rename: os.rename is atomic, so
    # concurrent processes (the multihost setup runs several on one host)
    # never dlopen a partially linked library
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.rename(tmp, _LIB)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        if lib.packer_abi_version() != 3:
            _build_failed = True
            return None

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64

        lib.pack_batch.argtypes = [
            i64,
            u64p, u64p, u64p, u64p, u64p, u64p, u64p, u64p,
            u64p, i64p, u64p, i64p, i64p, u8p,
            f32p, f32p, f32p, u8p, u8p, f32p, u8p,
            f32p, u8p, u8p,
            i64, i64, i64, i64, i64,
        ]
        lib.pack_batch.restype = None

        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _f32(a):
    """Zero-copy when already C-contiguous float32."""
    a = np.asarray(a)
    if a.dtype == np.float32 and a.flags.c_contiguous:
        return a
    return np.ascontiguousarray(a, np.float32)


def _u8(a):
    """bool → uint8 as a VIEW (same byte layout), never a copy."""
    a = np.asarray(a)
    if a.dtype == np.bool_ and a.flags.c_contiguous:
        return a.view(np.uint8)
    if a.dtype == np.uint8 and a.flags.c_contiguous:
        return a
    return np.ascontiguousarray(a, np.uint8)


def pack_batch(scenes, actor_orders, lane_orders, dst, th: int, tf: int, s_dst: int) -> None:
    """ONE native call packs the whole batch (v2 ABI).

    ``scenes`` — list of grid-aligned scene dicts; ``actor_orders`` /
    ``lane_orders`` — per-scene keep-index int32 arrays (already truncated
    to capacity); ``dst`` — the preallocated batch arrays.  Source
    addresses are marshalled as ONE uint64 array per field, so the Python
    side does O(B) pointer reads instead of O(B) ctypes dispatches — the
    redesign that makes the native path beat numpy (round-1 bench note).
    """
    lib = _load()
    assert lib is not None
    B = len(scenes)
    dummy_y = np.zeros((1, tf, 2), np.float32)

    # coerced source arrays (kept alive in this list for the call duration)
    keep = []

    def addr(a):
        keep.append(a)
        return a.ctypes.data

    def ptrs(field, coerce):
        return np.fromiter(
            (addr(coerce(s[field])) for s in scenes), np.uint64, count=B
        )

    x_p = ptrs("x", _f32)
    y_p = np.fromiter(
        (
            addr(_f32(s["y"]) if s.get("y") is not None else dummy_y)
            for s in scenes
        ),
        np.uint64,
        count=B,
    )
    pos_p = ptrs("positions", _f32)
    pad_p = ptrs("padding_mask", _u8)
    bos_p = ptrs("bos_mask", _u8)
    ang_p = ptrs("rotate_angles", _f32)
    lp_p = ptrs("lane_positions", _f32)
    lpad_p = ptrs("lane_paddings", _u8)
    aord_p = np.fromiter((addr(o) for o in actor_orders), np.uint64, count=B)
    lord_p = np.fromiter((addr(o) for o in lane_orders), np.uint64, count=B)
    n_actors = np.fromiter((len(o) for o in actor_orders), np.int64, count=B)
    n_lanes = np.fromiter((len(o) for o in lane_orders), np.int64, count=B)
    s_src = np.fromiter(
        (s["lane_positions"].shape[1] for s in scenes), np.int64, count=B
    )
    has_y = np.fromiter(
        (0 if s.get("y") is None else 1 for s in scenes), np.uint8, count=B
    )

    lib.pack_batch(
        B,
        x_p, y_p, pos_p, pad_p, bos_p, ang_p, lp_p, lpad_p,
        aord_p, n_actors, lord_p, n_lanes, s_src, has_y,
        dst["x"], dst["y"], dst["positions"],
        dst["padding"].view(np.uint8), dst["bos"].view(np.uint8),
        dst["angles"], dst["actor_valid"].view(np.uint8),
        dst["lane_positions"], dst["lane_paddings"].view(np.uint8),
        dst["lane_valid"].view(np.uint8),
        dst["x"].shape[1], dst["lane_positions"].shape[1], th, tf, s_dst,
    )
