"""ctypes loader/builder for the C++ entropy-codec extension.

Builds native/entropy_codec.cpp with g++ on first use (cached next to the
source); falls back to None (pure-Python paths) if no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_NATIVE = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_SRC_DIR, "entropy_codec.cpp")
_LIB = os.path.join(_SRC_DIR, "libentropy_codec.so")

_i64 = ctypes.c_int64
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")


class NativeCodec:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.cgic_huff_encode.restype = _i64
        lib.cgic_huff_encode.argtypes = [
            _i32p, _i64, _u16p, _u8p, ctypes.c_int32, _u8p, _i64]
        lib.cgic_huff_decode.restype = _i64
        lib.cgic_huff_decode.argtypes = [
            _u8p, _i64, _i32p, ctypes.c_int32, ctypes.c_void_p, _i32p, _i64]
        lib.cgic_huff_lut_size.restype = _i64
        lib.cgic_huff_lut_size.argtypes = []
        lib.cgic_huff_build_lut.restype = None
        lib.cgic_huff_build_lut.argtypes = [_i32p, ctypes.c_int32, _i32p]
        lib.cgic_bitmap_encode.restype = _i64
        lib.cgic_bitmap_encode.argtypes = [_u8p, _i64, _u8p, _i64]
        lib.cgic_bitmap_decode.restype = _i64
        lib.cgic_bitmap_decode.argtypes = [_u8p, _i64, _u8p, _i64]

    def huff_encode(self, symbols: np.ndarray, lens: np.ndarray,
                    code_bytes: np.ndarray) -> Optional[bytes]:
        n = symbols.size
        max_bits = int(lens.max()) if lens.size else 0
        cap = 2 + (n * max_bits + 7) // 8 + 8
        out = np.zeros(cap, np.uint8)
        written = self._lib.cgic_huff_encode(
            np.ascontiguousarray(symbols, np.int32), n,
            np.ascontiguousarray(lens, np.uint16),
            np.ascontiguousarray(code_bytes.reshape(-1), np.uint8),
            np.int32(lens.shape[0]), out, cap)
        if written < 0:
            return None
        return out[:written].tobytes()

    def huff_build_lut(self, trie: np.ndarray) -> np.ndarray:
        """Prebuild the K-bit decode LUT for a fixed code table (one-time;
        passed back into huff_decode so per-call builds are skipped)."""
        lut = np.empty(int(self._lib.cgic_huff_lut_size()), np.int32)
        self._lib.cgic_huff_build_lut(
            np.ascontiguousarray(trie, np.int32),
            np.int32(trie.size // 2), lut)
        return lut

    def huff_decode(self, data: bytes, trie: np.ndarray,
                    lut: Optional[np.ndarray] = None
                    ) -> Optional[np.ndarray]:
        buf = np.frombuffer(data, np.uint8)
        # payload bits is an upper bound on symbol count
        cap = max(1, len(data) * 8)
        out = np.empty(cap, np.int32)   # C++ writes exactly n entries
        n = self._lib.cgic_huff_decode(
            np.ascontiguousarray(buf), len(data),
            np.ascontiguousarray(trie, np.int32),
            np.int32(trie.size // 2),
            None if lut is None else lut.ctypes.data, out, cap)
        if n < 0:
            return None
        return out[:n]

    def bitmap_encode(self, bits: np.ndarray) -> Optional[bytes]:
        n = bits.size
        cap = 2 + (n + 7) // 8 + 8
        out = np.zeros(cap, np.uint8)
        written = self._lib.cgic_bitmap_encode(
            np.ascontiguousarray(bits, np.uint8), n, out, cap)
        if written < 0:
            return None
        return out[:written].tobytes()

    def bitmap_decode(self, data: bytes) -> Optional[np.ndarray]:
        buf = np.frombuffer(data, np.uint8)
        cap = max(1, len(data) * 8)
        out = np.zeros(cap, np.uint8)
        n = self._lib.cgic_bitmap_decode(np.ascontiguousarray(buf),
                                         len(data), out, cap)
        if n < 0:
            return None
        return out[:n]


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_native() -> Optional[NativeCodec]:
    """Load (building if needed) the native codec; None if unavailable."""
    global _NATIVE, _TRIED
    with _LOCK:
        if _TRIED:
            return _NATIVE
        _TRIED = True
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            _NATIVE = NativeCodec(ctypes.CDLL(_LIB))
        except OSError:
            _NATIVE = None
        return _NATIVE
