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
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
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
        if lib.packer_abi_version() != 1:
            _build_failed = True
            return None

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64

        lib.pack_scene_actors.argtypes = [
            f32p, f32p, f32p, u8p, u8p, f32p,
            i32p, i64, ctypes.c_int,
            f32p, f32p, f32p, u8p, u8p, f32p, u8p,
            i64, i64,
        ]
        lib.pack_scene_actors.restype = None
        lib.pack_scene_lanes.argtypes = [
            f32p, u8p, i32p, i64, f32p, u8p, u8p, i64, i64,
        ]
        lib.pack_scene_lanes.restype = None
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


def pack_scene_actors(scene, order, dst, b: int, th: int, tf: int) -> None:
    """Native actor gather-copy into batch slice ``b`` of ``dst`` dict."""
    lib = _load()
    assert lib is not None
    y = scene.get("y")
    has_y = 0 if y is None else 1
    dummy = np.zeros((1, tf, 2), np.float32)
    lib.pack_scene_actors(
        _f32(scene["x"]),
        _f32(y if y is not None else dummy),
        _f32(scene["positions"]),
        _u8(scene["padding_mask"]),
        _u8(scene["bos_mask"]),
        _f32(scene["rotate_angles"]),
        np.ascontiguousarray(order, np.int32),
        len(order),
        has_y,
        dst["x"][b],
        dst["y"][b],
        dst["positions"][b],
        dst["padding"][b].view(np.uint8),
        dst["bos"][b].view(np.uint8),
        dst["angles"][b],
        dst["actor_valid"][b].view(np.uint8),
        th,
        tf,
    )


def pack_scene_lanes(scene, order, dst, b: int, s_dst: int) -> None:
    lib = _load()
    assert lib is not None
    lp = _f32(scene["lane_positions"])
    lib.pack_scene_lanes(
        lp,
        _u8(scene["lane_paddings"]),
        np.ascontiguousarray(order, np.int32),
        len(order),
        dst["lane_positions"][b],
        dst["lane_paddings"][b].view(np.uint8),
        dst["lane_valid"][b].view(np.uint8),
        lp.shape[1],
        s_dst,
    )
