"""Native (C++) host-runtime: threaded JPEG decode/resize pipeline.

Compiled on first use with g++ into the package's build dir and loaded
via ctypes (no pybind11 in this environment). Falls back cleanly when
no toolchain / libjpeg is present — callers check
:func:`native_available` before routing batches here.
"""
from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "fastimage.cpp"
_BUILD_DIR = Path(__file__).parent / "_build"
_lib = None
_lib_failed = False


def _build_lib() -> Path | None:
    src_hash = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:12]
    so_path = _BUILD_DIR / f"fastimage_{src_hash}.so"
    if so_path.exists():
        return so_path
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(so_path), "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
        stderr = getattr(e, "stderr", b"") or b""
        print(f"fastimage build failed ({e}); {stderr.decode()[:500]}")
        return None
    return so_path


def get_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    so = _build_lib()
    if so is None:
        _lib_failed = True
        return None
    lib = ctypes.CDLL(str(so))
    lib.decode_resize_batch.restype = ctypes.c_int
    lib.decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),  # paths
        ctypes.c_int,                     # n
        ctypes.c_int,                     # resize_short
        ctypes.c_int,                     # crop
        ctypes.POINTER(ctypes.c_float),   # mean
        ctypes.POINTER(ctypes.c_float),   # std
        ctypes.POINTER(ctypes.c_ubyte),   # hflip or None
        ctypes.c_int,                     # fast_dct
        ctypes.POINTER(ctypes.c_float),   # out
        ctypes.c_int,                     # n_threads
    ]
    lib.decode_resize_batch_u8.restype = ctypes.c_int
    lib.decode_resize_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),  # paths
        ctypes.c_int,                     # n
        ctypes.c_int,                     # resize_short
        ctypes.c_int,                     # crop
        ctypes.POINTER(ctypes.c_ubyte),   # hflip or None
        ctypes.c_int,                     # fast_dct
        ctypes.POINTER(ctypes.c_ubyte),   # out
        ctypes.c_int,                     # n_threads
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def decode_batch(
    paths: list[str],
    resize_short: int = 256,
    crop: int = 224,
    mean=(0.485, 0.456, 0.406),
    std=(0.229, 0.224, 0.225),
    hflip: np.ndarray | None = None,
    fast_dct: bool = False,
    n_threads: int = 16,
) -> np.ndarray:
    """Decode JPEG paths → (n, crop, crop, 3) float32 normalized NHWC."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("fastimage native library unavailable")
    n = len(paths)
    out = np.empty((n, crop, crop, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_mean = (ctypes.c_float * 3)(*[float(m) for m in mean])
    c_std = (ctypes.c_float * 3)(*[float(s) for s in std])
    c_flip = None
    if hflip is not None:
        flags = np.ascontiguousarray(hflip, np.uint8)
        c_flip = flags.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    lib.decode_resize_batch(
        c_paths, n, resize_short, crop, c_mean, c_std, c_flip,
        1 if fast_dct else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    return out


def decode_batch_u8(
    paths: list[str],
    resize_short: int = 256,
    crop: int = 224,
    hflip: np.ndarray | None = None,
    fast_dct: bool = False,
    n_threads: int = 16,
) -> np.ndarray:
    """Decode JPEG paths → (n, crop, crop, 3) uint8 NHWC (no normalize).

    The uint8_transfer feed: rounding happens in C++ during the crop
    pass, avoiding the float32 batch round-trip (+ numpy rint/clip/
    astype) the float API needs for uint8 output.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("fastimage native library unavailable")
    n = len(paths)
    out = np.empty((n, crop, crop, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_flip = None
    if hflip is not None:
        flags = np.ascontiguousarray(hflip, np.uint8)
        c_flip = flags.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    lib.decode_resize_batch_u8(
        c_paths, n, resize_short, crop, c_flip, 1 if fast_dct else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n_threads,
    )
    return out
