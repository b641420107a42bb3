"""ctypes bindings for the native runtime (libfpcruntime.so).

Auto-builds the library on first use when a toolchain is available and
falls back cleanly (``available() == False``) otherwise; callers in
data/frames.py and models/blendshape.py use the pure-Python path when the
native one is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libfpcruntime.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.fpc_tiff_probe.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_uint32),
                                   ctypes.POINTER(ctypes.c_uint32)]
    lib.fpc_tiff_probe.restype = ctypes.c_int
    lib.fpc_load_take.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fpc_load_take.restype = ctypes.c_int
    lib.fpc_parse_obj_vertices.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int]
    lib.fpc_parse_obj_vertices.restype = ctypes.c_int
    lib.fpc_seq_read_frames.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_int]
    lib.fpc_seq_read_frames.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _paths_array(paths: list[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def tiff_probe(path: str) -> tuple[int, int] | None:
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    if lib.fpc_tiff_probe(path.encode(), ctypes.byref(w), ctypes.byref(h)):
        return None
    return int(w.value), int(h.value)


def load_tiffs(paths: list[str], width: int, height: int,
               clip_max: int = 140, flip: bool = True,
               n_threads: int = 0) -> np.ndarray:
    """Decode grayscale TIFFs -> (N, H, W) uint8, clipped + flipped.

    Raises RuntimeError if the native library is unavailable or any file
    fails to decode (caller falls back to PIL).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    out = np.empty((len(paths), height, width), np.uint8)
    n_threads = n_threads or min(16, os.cpu_count() or 1)
    failures = lib.fpc_load_take(
        _paths_array(paths), len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        width, height, clip_max, int(flip), n_threads)
    if failures:
        raise RuntimeError(f"{failures} TIFFs failed native decode")
    return out


def parse_obj_vertices(paths: list[str], n_floats: int,
                       n_threads: int = 0) -> np.ndarray:
    """Parse vertex blocks of many OBJs -> (N, n_floats) float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    out = np.empty((len(paths), n_floats), np.float32)
    n_threads = n_threads or min(16, os.cpu_count() or 1)
    failures = lib.fpc_parse_obj_vertices(
        _paths_array(paths), len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_floats, n_threads)
    if failures:
        raise RuntimeError(f"{failures} OBJs failed native parse")
    return out


def seq_read_frames(path: str, first: int, count: int, width: int,
                    height: int, true_image_size: int,
                    n_threads: int = 0) -> np.ndarray:
    """Bulk-read uncompressed .seq frames -> (count, H, W) uint8."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    out = np.empty((count, height, width), np.uint8)
    n_threads = n_threads or min(16, os.cpu_count() or 1)
    rc = lib.fpc_seq_read_frames(
        path.encode(), first, count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        width, height, true_image_size, n_threads)
    if rc:
        raise RuntimeError(f"{rc} seq frames failed to read")
    return out
