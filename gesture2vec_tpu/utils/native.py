"""On-demand compilation + ctypes bindings for the native host kernels.

native/g2v_native.cpp holds the C++ data-path kernels (BVH float
decoding, batched euler->rotmat, window extraction). This module
compiles it once per machine with g++ -O3 into a cached shared object
and binds the symbols with ctypes - no pybind11 required. Every entry
point degrades to the numpy implementation when the toolchain or the
.so is unavailable, so the framework never hard-depends on native code.
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SOURCE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "g2v_native.cpp")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _cache_path(source: str) -> str:
    with open(source, "rb") as f:
        digest = hashlib.sha1(f.read()).hexdigest()[:12]
    cache_dir = os.path.join(tempfile.gettempdir(), "g2v_native")
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"g2v_native_{digest}.so")


def load() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("G2V_NO_NATIVE"):
        return None
    try:
        so = _cache_path(_SOURCE)
        if not os.path.exists(so):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 _SOURCE, "-o", so],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(so)
        lib.g2v_parse_floats.restype = ctypes.c_int64
        lib.g2v_parse_floats.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
        lib.g2v_euler_zxy_to_rotmat.restype = None
        lib.g2v_euler_zxy_to_rotmat.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double)]
        lib.g2v_extract_windows.restype = ctypes.c_int64
        lib.g2v_extract_windows.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.g2v_format_motion.restype = ctypes.c_int64
        lib.g2v_format_motion.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
        _lib = lib
        logging.debug("native kernels loaded from %s", so)
    except Exception as e:  # toolchain missing, compile error, ...
        logging.debug("native kernels unavailable (%s); using numpy", e)
        _lib = None
    return _lib


def parse_floats(text: str, expected: int) -> np.ndarray:
    """Whitespace-separated floats -> (n,) float64."""
    lib = load()
    if lib is None:
        return np.array(text.split(), dtype=np.float64)
    raw = text.encode()
    out = np.empty(expected + 8, dtype=np.float64)
    n = lib.g2v_parse_floats(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.shape[0])
    if n != expected:
        # count mismatch (malformed tokens skipped by the C parser, or
        # truncated/extra input): route through numpy so the result
        # matches the fallback path exactly. The common case skips the
        # costly Python text.split() re-tokenization entirely.
        return np.array(text.split(), dtype=np.float64)
    return out[:n]


def euler_zxy_to_rotmat(euler_deg: np.ndarray) -> np.ndarray:
    """(n, 3) ZXY euler degrees -> (n, 9) row-major rotation matrices."""
    lib = load()
    e = np.ascontiguousarray(euler_deg, dtype=np.float64)
    if lib is None:
        from gesture2vec_tpu.mocap import rotations as rot
        return np.asarray(rot.euler_to_matrix(e, "ZXY")).reshape(-1, 9)
    out = np.empty((e.shape[0], 9), dtype=np.float64)
    lib.g2v_euler_zxy_to_rotmat(
        e.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), e.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def extract_windows(frames: np.ndarray, window: int,
                    stride: int) -> np.ndarray:
    """(T, D) float32 -> (N, window, D) sliding windows."""
    lib = load()
    f = np.ascontiguousarray(frames, dtype=np.float32)
    T, D = f.shape
    n = max((T - window) // stride + 1, 0)
    if lib is None or n == 0:
        return np.stack([f[k * stride: k * stride + window]
                         for k in range(n)], axis=0) if n else \
            np.zeros((0, window, D), np.float32)
    out = np.empty((n, window, D), dtype=np.float32)
    got = lib.g2v_extract_windows(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), T, D, window,
        stride, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    return out[:got]


def format_motion(mat: np.ndarray) -> str:
    """(rows, cols) float64 -> BVH motion-block text ("%.6f", space-
    separated, newline per row) - the exporter's hot loop (~2.5M format
    calls per 30-minute clip in pure Python)."""
    m = np.ascontiguousarray(mat, dtype=np.float64)
    if not m.size:
        return "\n"   # byte-parity with the pure-Python writer, which
        # appended body + "\n" unconditionally (empty body, 0 frames)
    lib = load()
    if lib is not None and m.size:
        cap = int(m.size * 28 + m.shape[0] + 64)
        buf = ctypes.create_string_buffer(cap)
        n = lib.g2v_format_motion(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            m.shape[0], m.shape[1], buf, cap)
        if n > 0:
            return buf.raw[:n].decode("ascii")
    return "\n".join(" ".join(f"{v:.6f}" for v in row)
                     for row in m) + "\n"
