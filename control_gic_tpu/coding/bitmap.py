"""Grain-mask bitmap codec: 1 bit per element, reference frame format.

Behavioral contract: /root/reference/CGIC/tools/mask_coding.py:8-96 — the
identity code {0:'0', 1:'1'} with the same pad-header framing as the Huffman
streams. Encoding is np.packbits (native already); the C++ path is used when
present for symmetry.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from .native_lib import get_native


class BitmapCodec:
    def __init__(self):
        self._native = get_native()

    def encode(self, bits) -> bytes:
        """bits: array-like of 0/1. Empty -> b'' (reference contract)."""
        arr = np.asarray(bits).reshape(-1).astype(np.uint8)
        if arr.size == 0:
            return b""
        if self._native is not None:
            out = self._native.bitmap_encode(arr)
            if out is not None:
                return out
        n = arr.size
        pad = 8 - n % 8
        framed = np.concatenate([
            np.unpackbits(np.array([pad], np.uint8)),
            arr, np.zeros(pad, np.uint8)])
        return np.packbits(framed).tobytes()

    def decode(self, data: bytes) -> Optional[List[int]]:
        if len(data) == 0:
            return None
        if self._native is not None:
            out = self._native.bitmap_decode(data)
            if out is not None:
                return out.tolist()
        arr = np.unpackbits(np.frombuffer(data, np.uint8))
        pad = int(np.packbits(arr[:8])[0])
        payload = arr[8:]
        return payload[:payload.size - pad].astype(int).tolist()
