"""Huffman index-stream codec with byte-exact reference framing.

Tree construction replicates /root/reference/CGIC/tools/indices_coding.py:9-76
exactly: nodes pushed into a binary heap in symbol order with `<` comparing
frequency only (ties resolved purely by heap mechanics — Python's heapq is
used directly, so tie behavior is identical by construction), repeated
two-smallest merges, then an iterative right-first DFS assigning '0' to left
and '1' to right children. All symbols present in the frequency table get a
code, including zero-frequency ones.

The per-image hot path (packing code bits / walking the decode trie) runs in
the C++ extension (native/entropy_codec.cpp) when built, with a pure-Python
fallback that is also the oracle in tests.

Frame format (indices_coding.py:91-126): one pad-count byte (1..8 — a
byte-aligned payload still takes 8 pad bits), then MSB-first code bits
zero-padded. An empty symbol stream encodes to an empty byte string and
decodes to None, matching compress()/decompress_string() (:113-118,153-159).
"""
from __future__ import annotations

import heapq
from typing import Dict, List, Mapping, Optional, Sequence

import numpy as np

from .native_lib import get_native


class _Node:
    __slots__ = ("sym", "freq", "left", "right")

    def __init__(self, sym, freq):
        self.sym = sym
        self.freq = freq
        self.left = None
        self.right = None

    def __lt__(self, other):
        return self.freq < other.freq


def build_huffman_codes(frequencies: Mapping[int, int]) -> Dict[int, str]:
    """Symbol -> bitstring code table. Iteration order of `frequencies`
    determines heap insertion order (the reference iterates its counter dict
    in symbol order 0..n-1)."""
    heap: List[_Node] = []
    for sym, freq in frequencies.items():
        heapq.heappush(heap, _Node(int(sym), int(freq)))
    if not heap:
        return {}
    if len(heap) == 1:
        # Degenerate single-symbol table: the reference's DFS assigns the
        # root (a leaf) the empty code; keep that behavior.
        return {heap[0].sym: ""}
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        merged = _Node(None, a.freq + b.freq)
        merged.left = a
        merged.right = b
        heapq.heappush(heap, merged)
    codes: Dict[int, str] = {}
    stack = [(heap[0], "")]
    while stack:
        node, code = stack.pop()
        if node is None:
            continue
        if node.sym is not None:
            codes[node.sym] = code
        stack.append((node.right, code + "1"))
        stack.append((node.left, code + "0"))
    return codes


def _frame_bits(bits: str) -> bytes:
    """Pad-header framing shared by index and mask streams."""
    pad = 8 - len(bits) % 8            # 1..8 by the reference's formula
    bits = f"{pad:08b}" + bits + "0" * pad
    return np.packbits(
        np.frombuffer(bits.encode("ascii"), np.uint8) - ord("0")).tobytes()


def _unframe_bits(data: bytes) -> Optional[str]:
    if len(data) == 0:
        return None
    arr = np.unpackbits(np.frombuffer(data, np.uint8))
    pad = int(np.packbits(arr[:8])[0])
    payload = arr[8:]
    payload = payload[:len(payload) - pad]
    return "".join("1" if b else "0" for b in payload)


class HuffmanCodec:
    """Encode/decode int symbol streams with a fixed code table."""

    MAX_CODE_BYTES = 32  # supports code lengths up to 256 bits

    def __init__(self, frequencies: Mapping[int, int]):
        self.codes = build_huffman_codes(frequencies)
        self.n_sym = (max(self.codes) + 1) if self.codes else 0
        self._native = get_native()
        self._lut = None  # K-bit decode LUT, built lazily on first decode
        self._prepare_tables()

    @classmethod
    def from_counts(cls, counts: Sequence[int]) -> "HuffmanCodec":
        """Build the table the way the reference does at runtime.

        The reference iterates `model.quantize.embedding_counter` — an
        nn.ParameterDict (quantize.py:28) — to fill its heap
        (indices_coding.py:46-48 via inference.py:137-139). torch's
        ParameterDict.update sorts plain-dict keys, so iteration order is
        LEXICOGRAPHIC on the stringified symbol ("0","1","10","11",...),
        not numeric; heapq tie-breaking depends on insertion order, so the
        same order is required for byte-identical streams (pinned by
        test_coding / test_golden_pipeline against the real ParameterDict).
        """
        items = sorted((str(i), int(c)) for i, c in enumerate(counts))
        return cls({int(k): v for k, v in items})

    def _prepare_tables(self):
        n = self.n_sym
        max_len = max((len(c) for c in self.codes.values()), default=0)
        # Degenerate frequency tables — e.g. counters with a long zero
        # tail from a briefly-trained codebook (the reference feeds ALL
        # 1024 counter entries to the heap, indices_coding.py:46-48, so
        # unused symbols chain into codes up to n_sym-1 bits) — exceed
        # the C++ encoder's fixed 32-byte code stride; size the table to
        # the actual max and route encode through the Python path then.
        self.code_stride = max(self.MAX_CODE_BYTES, (max_len + 7) // 8)
        self.lens = np.zeros(n, np.uint16)
        self.code_bytes = np.zeros((n, self.code_stride), np.uint8)
        for sym, code in self.codes.items():
            self.lens[sym] = len(code)
            for i, bit in enumerate(code):
                if bit == "1":
                    self.code_bytes[sym, i >> 3] |= 0x80 >> (i & 7)
        # Decode trie: trie[2*node + bit] = child index >= 0 or ~symbol
        # (< 0). EMPTY marks unreachable slots (valid streams never hit
        # them; ~symbol for any real symbol is > INT32_MIN).
        empty = np.iinfo(np.int32).min
        nodes = [[empty, empty]]
        for sym, code in self.codes.items():
            cur = 0
            for i, bit in enumerate(code):
                b = int(bit)
                if i == len(code) - 1:
                    nodes[cur][b] = ~sym
                else:
                    if nodes[cur][b] == empty:
                        nodes.append([empty, empty])
                        nodes[cur][b] = len(nodes) - 1
                    cur = nodes[cur][b]
        self.trie = np.asarray(nodes, np.int32).reshape(-1)

    # ------------------------------------------------------------- encode

    def encode(self, symbols) -> bytes:
        symbols = np.asarray(symbols, np.int32).reshape(-1)
        if symbols.size == 0:
            return b""
        if self._native is not None and \
                self.code_stride == self.MAX_CODE_BYTES:
            out = self._native.huff_encode(symbols, self.lens,
                                           self.code_bytes)
            if out is not None:
                return out
        bits = "".join(self.codes[int(s)] for s in symbols)
        return _frame_bits(bits)

    # ------------------------------------------------------------- decode

    def decode(self, data: bytes) -> Optional[List[int]]:
        """None for an empty stream (reference decompress_string contract)."""
        out = self.decode_array(data)
        return None if out is None else out.tolist()

    def decode_array(self, data: bytes) -> Optional[np.ndarray]:
        """decode() without the list materialization — the receiver hot
        path (codec.py scatters the symbols straight into numpy grids, so
        building 10^5 Python ints per DIV2K tile sweep would dominate the
        C++ decode itself)."""
        if len(data) == 0:
            return None
        if self._native is not None:
            if self._lut is None:
                self._lut = self._native.huff_build_lut(self.trie)
            out = self._native.huff_decode(data, self.trie, self._lut)
            if out is not None:
                return out
        bits = _unframe_bits(data)
        out: List[int] = []
        node = 0
        trie = self.trie
        for ch in bits:
            nxt = int(trie[2 * node + (ch == "1")])
            if nxt < 0:
                out.append(~nxt)
                node = 0
            else:
                node = nxt
        return np.asarray(out, np.int32)

    # --------------------------------------------------------------- misc

    def expected_bits(self, symbols) -> int:
        symbols = np.asarray(symbols, np.int32).reshape(-1)
        return int(self.lens[symbols].sum())
