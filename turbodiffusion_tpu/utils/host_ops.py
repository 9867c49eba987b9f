"""ctypes bindings for the native host-ops library (csrc/host_ops.cpp).

Auto-builds with g++ on first use if missing; every function has a numpy
fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libtdx_host.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.u8_to_f32_norm.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t]
        lib.f32_to_u8.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_size_t]
        lib.psnr_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t, ctypes.c_double]
        lib.psnr_f32.restype = ctypes.c_double
        lib.tar_index.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.c_long]
        lib.tar_index.restype = ctypes.c_long
        lib.tar_read_ranges.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long), ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_long),
            ctypes.c_int]
        lib.tar_read_ranges.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def u8_to_f32_norm(x: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1,1]."""
    x = np.ascontiguousarray(x, np.uint8)
    lib = _load()
    if lib is None:
        return x.astype(np.float32) * (2.0 / 255.0) - 1.0
    out = np.empty(x.shape, np.float32)
    lib.u8_to_f32_norm(x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       x.size)
    return out


def f32_to_u8(x: np.ndarray) -> np.ndarray:
    """float32 [0,1] -> uint8 with clip + (v*255 + 0.5) rounding."""
    x = np.ascontiguousarray(x, np.float32)
    lib = _load()
    if lib is None:
        return (np.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    out = np.empty(x.shape, np.uint8)
    lib.f32_to_u8(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                  out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                  x.size)
    return out


_NAME_STRIDE = 264


def tar_index(path: str, max_members: int = 1 << 20):
    """Index a tar shard natively: [(name, data_offset, size), ...].

    C-side ustar/pax parser (csrc/host_ops.cpp tar_index) — skips pax/GNU
    metadata entries; falls back to Python tarfile without the library.
    The webdataset loader's fast path (training/data.py)."""
    lib = _load()
    if lib is None or not hasattr(lib, "tar_index"):
        import tarfile
        out = []
        with tarfile.open(path) as tf:
            for m in tf:
                if m.isfile():
                    out.append((m.name, m.offset_data, m.size))
        return out
    names = ctypes.create_string_buffer(max_members * _NAME_STRIDE)
    offs = (ctypes.c_long * max_members)()
    sizes = (ctypes.c_long * max_members)()
    n = lib.tar_index(path.encode(), names, _NAME_STRIDE, offs, sizes,
                      max_members)
    if n < 0:
        raise OSError(f"tar_index({path}) failed: {n}")
    return [(names[i * _NAME_STRIDE:(i + 1) * _NAME_STRIDE].split(b"\0")[0]
             .decode(), offs[i], sizes[i]) for i in range(n)]


def tar_read_ranges(path: str, ranges, n_threads: int = 4):
    """Read [(offset, size), ...] from a file with threaded pread; returns
    a list of bytes objects (one per range)."""
    lib = _load()
    if lib is None or not hasattr(lib, "tar_read_ranges"):
        out = []
        with open(path, "rb") as f:
            for off, size in ranges:
                f.seek(off)
                out.append(f.read(size))
        return out
    n = len(ranges)
    if n == 0:
        return []
    offs = (ctypes.c_long * n)(*[r[0] for r in ranges])
    sizes = (ctypes.c_long * n)(*[r[1] for r in ranges])
    out_offs_list = np.cumsum([0] + [r[1] for r in ranges])[:-1].tolist()
    out_offs = (ctypes.c_long * n)(*out_offs_list)
    total = int(sum(r[1] for r in ranges))
    buf = np.empty(total, np.uint8)
    rc = lib.tar_read_ranges(
        path.encode(), offs, sizes, n,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_offs,
        n_threads)
    if rc != 0:
        raise OSError(f"tar_read_ranges({path}) failed")
    return [buf[o:o + s].tobytes()
            for o, s in zip(out_offs_list, (r[1] for r in ranges))]


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    """PSNR (dB) — the parity metric for kernel/quantization comparisons."""
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    assert a.shape == b.shape
    lib = _load()
    if lib is None:
        mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
        return 1e9 if mse <= 0 else 10.0 * np.log10(peak * peak / mse)
    return float(lib.psnr_f32(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.size, peak))
