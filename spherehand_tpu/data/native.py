"""ctypes bindings for the native data-loader library (native/shx_loader.cc).

The reference's native footprint is a CUDA render kernel; ours is the data
loader — PNG depth decode + metric-cube cropping over a C++ thread pool,
which dominates offline NYU preprocessing (~220k images). The library builds
on demand with the repo Makefile (g++ + libpng); every entry point has a
pure-numpy fallback in :mod:`spherehand_tpu.data.nyu`, so the framework runs
without a compiler too.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libshx_loader.so"))

_lib = None


def _build_library() -> None:
    subprocess.run(
        ["make", "-s", "libshx_loader.so"],
        cwd=os.path.abspath(_NATIVE_DIR),
        check=True,
    )


def load_library(rebuild: bool = False) -> ctypes.CDLL:
    """Load (building if necessary) the native loader library."""
    global _lib
    if _lib is not None and not rebuild:
        return _lib
    if rebuild or not os.path.exists(_LIB_PATH):
        _build_library()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.shx_decode_depth_png.restype = ctypes.c_int
    lib.shx_decode_depth_png.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.shx_crop_depth.restype = None
    lib.shx_crop_depth.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.shx_decode_crop_batch.restype = ctypes.c_int
    lib.shx_decode_crop_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_depth_png(path: str, height: int = 480, width: int = 640) -> np.ndarray:
    lib = load_library()
    out = np.empty((height, width), np.float32)
    rc = lib.shx_decode_depth_png(path.encode(), _fptr(out), height, width)
    if rc != 0:
        raise IOError(f"shx_decode_depth_png({path}) failed with code {rc}")
    return out


def crop_depth(
    dm: np.ndarray,
    center: np.ndarray,
    fx: float = 588.235,
    fy: float = 587.084,
    cx: float = 320.0,
    cy: float = 240.0,
    cube: float = 300.0,
    out_size: int = 64,
    background: float = 100.0,
) -> np.ndarray:
    lib = load_library()
    dm = np.ascontiguousarray(dm, np.float32)
    center = np.ascontiguousarray(center, np.float32)
    out = np.empty((out_size, out_size), np.float32)
    lib.shx_crop_depth(
        _fptr(dm), dm.shape[0], dm.shape[1], _fptr(center),
        fx, fy, cx, cy, cube, out_size, background, _fptr(out),
    )
    return out


def decode_crop_batch(
    paths: list[str],
    centers: np.ndarray,
    dm_shape: tuple[int, int] = (480, 640),
    fx: float = 588.235,
    fy: float = 587.084,
    cx: float = 320.0,
    cy: float = 240.0,
    cube: float = 300.0,
    out_size: int = 64,
    background: float = 100.0,
    num_threads: int = 0,
) -> tuple[np.ndarray, int]:
    """Decode + crop a batch of depth PNGs in parallel.

    Returns (crops (N, out_size, out_size), num_failures).
    """
    lib = load_library()
    n = len(paths)
    centers = np.ascontiguousarray(centers, np.float32)
    assert centers.shape == (n, 3)
    out = np.empty((n, out_size, out_size), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.shx_decode_crop_batch(
        c_paths, n, _fptr(centers), dm_shape[0], dm_shape[1],
        fx, fy, cx, cy, cube, out_size, background, num_threads, _fptr(out),
    )
    return out, int(failures)
