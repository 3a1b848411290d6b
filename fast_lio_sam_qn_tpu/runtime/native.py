"""ctypes bindings for the native host runtime (runtime.cpp).

Builds the shared library on first use if a compiler is available; all
entry points have pure-Python fallbacks (utils/io.py) so the package works
without a toolchain — the native path is the production one (multithreaded
decode + prefetch overlapping device compute).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "runtime.cpp")
_LIB = os.path.join(_HERE, "libflsq_runtime.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it if needed; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        c_chr_pp = ctypes.POINTER(ctypes.c_char_p)
        f32_p = ctypes.POINTER(ctypes.c_float)
        lib.flsq_read_velodyne_bin.restype = ctypes.c_int64
        lib.flsq_read_velodyne_bin.argtypes = [ctypes.c_char_p, f32_p,
                                               ctypes.c_int64]
        lib.flsq_read_pcd.restype = ctypes.c_int64
        lib.flsq_read_pcd.argtypes = [ctypes.c_char_p, f32_p, ctypes.c_int64]
        lib.flsq_loader_create.restype = ctypes.c_void_p
        lib.flsq_loader_create.argtypes = [c_chr_pp, ctypes.c_int,
                                           ctypes.c_int64, ctypes.c_int,
                                           ctypes.c_int]
        lib.flsq_loader_get.restype = ctypes.c_int64
        lib.flsq_loader_get.argtypes = [ctypes.c_void_p, ctypes.c_int, f32_p]
        lib.flsq_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.flsq_sync_create.restype = ctypes.c_void_p
        lib.flsq_sync_create.argtypes = [ctypes.c_double]
        lib.flsq_sync_push_a.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                         ctypes.c_int64]
        lib.flsq_sync_push_b.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                         ctypes.c_int64]
        lib.flsq_sync_pop.restype = ctypes.c_int
        lib.flsq_sync_pop.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double)]
        lib.flsq_sync_destroy.argtypes = [ctypes.c_void_p]
        u8_p = ctypes.POINTER(ctypes.c_uint8)
        lib.flsq_lz4_decompress.restype = ctypes.c_int64
        lib.flsq_lz4_decompress.argtypes = [u8_p, ctypes.c_int64,
                                            u8_p, ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def lz4_decompress(data: bytes, decompressed_size: int) -> bytes:
    """Decompress a standard LZ4 frame (rosbag lz4 chunk compression).
    Implemented natively (no lz4 module ships in this environment)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(
            "lz4 rosbag chunks need the native runtime (g++ unavailable)")
    src = np.frombuffer(data, np.uint8)
    dst = np.empty(decompressed_size, np.uint8)
    n = lib.flsq_lz4_decompress(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(dst))
    if n < 0:
        raise ValueError("corrupt LZ4 frame in rosbag chunk")
    return dst[:n].tobytes()


def read_scan(path: str, cap: int = 1 << 18) -> np.ndarray:
    """Decode a .bin/.pcd scan natively -> (N, 4) xyzi. Python fallback."""
    lib = get_lib()
    if lib is None:
        from ..utils import io as pyio

        if path.endswith(".bin"):
            return pyio.read_velodyne_bin(path)
        # with_intensity keeps the fallback consistent with the native
        # decoder (zero-filling it silently dropped the channel)
        return pyio.load_pcd(path, with_intensity=True)
    buf = np.empty((cap, 4), np.float32)
    n = lib.flsq_read_velodyne_bin(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap) if path.endswith(".bin") else lib.flsq_read_pcd(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap)
    if n < 0:
        raise IOError(f"native decode failed: {path}")
    return buf[:n].copy()


class ScanLoader:
    """Prefetching scan loader over a file list (native worker pool;
    sequential Python fallback)."""

    def __init__(self, paths: Sequence[str], cap: int = 1 << 18,
                 n_threads: int = 4, lookahead: int = 8):
        self.paths = list(paths)
        self.cap = cap
        self._lib = get_lib()
        self._h = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._h = self._lib.flsq_loader_create(
                arr, len(self.paths), cap, n_threads, lookahead)

    def __len__(self):
        return len(self.paths)

    def get(self, idx: int) -> np.ndarray:
        if self._h is None:
            return read_scan(self.paths[idx], self.cap)
        buf = np.empty((self.cap, 4), np.float32)
        n = self._lib.flsq_loader_get(
            self._h, idx,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if n < 0:
            raise IOError(f"native decode failed: {self.paths[idx]}")
        return buf[:n].copy()

    def close(self):
        if self._h is not None:
            self._lib.flsq_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class ApproxTimeSync:
    """Approximate-time pairing of two stamped streams (the message_filters
    ApproximateTime stand-in; fast_lio_sam_qn.cpp:75-78)."""

    def __init__(self, slop: float = 0.05):
        self._lib = get_lib()
        self.slop = slop
        if self._lib is not None:
            self._h = self._lib.flsq_sync_create(slop)
        else:
            self._h = None
            self._qa: list = []
            self._qb: list = []

    def push_a(self, t: float, ident: int):
        if self._h is not None:
            self._lib.flsq_sync_push_a(self._h, t, ident)
        else:
            self._qa.append((t, ident))

    def push_b(self, t: float, ident: int):
        if self._h is not None:
            self._lib.flsq_sync_push_b(self._h, t, ident)
        else:
            self._qb.append((t, ident))

    def pop(self):
        """Next matched (id_a, id_b, t_a, t_b) or None."""
        if self._h is not None:
            ia = ctypes.c_int64()
            ib = ctypes.c_int64()
            ta = ctypes.c_double()
            tb = ctypes.c_double()
            if self._lib.flsq_sync_pop(self._h, ctypes.byref(ia),
                                       ctypes.byref(ib), ctypes.byref(ta),
                                       ctypes.byref(tb)):
                return ia.value, ib.value, ta.value, tb.value
            return None
        # python fallback mirrors the native algorithm
        while self._qa and self._qb:
            t_a, ia = self._qa[0]
            t_b, ib = self._qb[0]
            if t_a < t_b - self.slop:
                self._qa.pop(0)
                continue
            if t_b < t_a - self.slop:
                self._qb.pop(0)
                continue
            if len(self._qb) > 1 and abs(self._qb[1][0] - t_a) < abs(t_b - t_a):
                self._qb.pop(0)
                continue
            if len(self._qa) > 1 and abs(self._qa[1][0] - t_b) < abs(t_b - t_a):
                self._qa.pop(0)
                continue
            self._qa.pop(0)
            self._qb.pop(0)
            return ia, ib, t_a, t_b
        return None

    def close(self):
        if self._h is not None:
            self._lib.flsq_sync_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
