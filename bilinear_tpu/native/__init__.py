"""ctypes loader (and on-demand builder) for the native fastpack library.

Builds fastpack.cpp with g++ -O3 into a per-user cache dir on first use; all
entry points degrade gracefully to None when no compiler is available, and
data/pipeline.py falls back to PIL/numpy.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "fastpack.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(
        os.path.expanduser("~"), ".cache", "bilinear_tpu"
    )
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, f"fastpack_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    # Per-process tmp name so concurrent first-time builds (two CLIs racing
    # on a cold cache) cannot rename each other's half-written .so away.
    tmp = f"{so_path}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", tmp, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
    except Exception:
        return None
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return so_path


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so_path = _build()
    if so_path is None:
        return None
    lib = ctypes.CDLL(so_path)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i = ctypes.c_int
    lib.resize_linear_u8.argtypes = [u8p, i, i, i, u8p, i, i]
    lib.resize_linear_u8.restype = None
    lib.pack_canvas_f32.argtypes = [u8p, i, i, i, f32p, i, i, i]
    lib.pack_canvas_f32.restype = None
    lib.pack_canvas_u8.argtypes = [u8p, i, i, i, u8p, i, i, i]
    lib.pack_canvas_u8.restype = None
    _lib = lib
    return _lib


def resize_linear_u8(src: np.ndarray, dh: int, dw: int) -> Optional[np.ndarray]:
    """(sh, sw, ch) uint8 -> (dh, dw, ch) uint8, PIL-BILINEAR-compatible.
    Returns None if the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, ch = src.shape
    dst = np.empty((dh, dw, ch), np.uint8)
    lib.resize_linear_u8(src, sh, sw, ch, dst, dh, dw)
    return dst


def pack_canvas_f32(
    src: np.ndarray, canvas: int, ul_x: int, ul_y: int
) -> Optional[np.ndarray]:
    """(sh, sw, ch) uint8 region starting at (ul_x, ul_y) -> zero-padded
    (canvas, canvas, ch) float32 in [0, 1]. None if unavailable."""
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, ch = src.shape
    dst = np.empty((canvas, canvas, ch), np.float32)
    lib.pack_canvas_f32(src, sh, sw, ch, dst, canvas, int(ul_x), int(ul_y))
    return dst


def pack_canvas_u8(
    src: np.ndarray, canvas: int, ul_x: int, ul_y: int
) -> Optional[np.ndarray]:
    """(sh, sw, ch) uint8 region starting at (ul_x, ul_y) -> zero-padded
    (canvas, canvas, ch) uint8 (wire format for the u8 transport path).
    None if unavailable."""
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, ch = src.shape
    dst = np.empty((canvas, canvas, ch), np.uint8)
    lib.pack_canvas_u8(src, sh, sw, ch, dst, canvas, int(ul_x), int(ul_y))
    return dst
