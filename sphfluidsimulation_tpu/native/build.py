"""On-demand g++ build + ctypes loader for the native frame codec."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "framecodec.cpp")
_SO = os.path.join(_DIR, "_framecodec.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_framecodec():
    """ctypes handle to the frame codec, or None (callers fall back)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.splat_points.restype = ctypes.c_int64
        lib.splat_points.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64]
        if not hasattr(lib, "splat_points_alpha"):  # stale pre-alpha .so
            if not _build():
                return None
            lib = ctypes.CDLL(_SO)
        lib.splat_points_alpha.restype = ctypes.c_int64
        lib.splat_points_alpha.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64]
        lib.write_ply_binary.restype = ctypes.c_int32
        lib.write_ply_binary.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        _lib = lib
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def splat_points_native(xy: np.ndarray, z: np.ndarray, r_px: np.ndarray,
                        rgb: np.ndarray, img: np.ndarray) -> int | None:
    """Rasterize into ``img`` (u8[H, W, 3], modified in place); None when
    the native library is unavailable."""
    lib = load_framecodec()
    if lib is None:
        return None
    xy = np.ascontiguousarray(xy, np.float32)
    z = np.ascontiguousarray(z, np.float32)
    r_px = np.ascontiguousarray(r_px, np.float32)
    rgb = np.ascontiguousarray(rgb, np.uint8)
    assert img.flags["C_CONTIGUOUS"] and img.dtype == np.uint8
    h, w, _ = img.shape
    return int(lib.splat_points(_fptr(xy), _fptr(z), _fptr(r_px),
                                _u8ptr(rgb), len(z), _u8ptr(img), w, h))


def splat_points_alpha_native(xy: np.ndarray, z: np.ndarray,
                              r_px: np.ndarray, rgb: np.ndarray,
                              alpha: np.ndarray,
                              img: np.ndarray) -> int | None:
    """Translucent rasterization (SrcAlpha src-over, exact painter order)
    into ``img``; None when the native library is unavailable."""
    lib = load_framecodec()
    if lib is None or not hasattr(lib, "splat_points_alpha"):
        return None
    xy = np.ascontiguousarray(xy, np.float32)
    z = np.ascontiguousarray(z, np.float32)
    r_px = np.ascontiguousarray(r_px, np.float32)
    rgb = np.ascontiguousarray(rgb, np.uint8)
    alpha = np.ascontiguousarray(alpha, np.float32)
    assert img.flags["C_CONTIGUOUS"] and img.dtype == np.uint8
    h, w, _ = img.shape
    return int(lib.splat_points_alpha(
        _fptr(xy), _fptr(z), _fptr(r_px), _u8ptr(rgb), _fptr(alpha),
        len(z), _u8ptr(img), w, h))


def write_ply_native(path: str, pos: np.ndarray,
                     rgb: np.ndarray | None) -> bool:
    lib = load_framecodec()
    if lib is None:
        return False
    pos = np.ascontiguousarray(pos, np.float32)
    if rgb is None:
        rc = lib.write_ply_binary(path.encode(), _fptr(pos), None, len(pos))
    else:
        rgb = np.ascontiguousarray(rgb, np.uint8)
        rc = lib.write_ply_binary(path.encode(), _fptr(pos), _u8ptr(rgb),
                                  len(pos))
    return rc == 0
