"""On-device Huffman encoding as a parallel prefix scan (jnp, jit-friendly).

The reference packs Huffman bits with a Python string loop — O(bits) host
work per image (indices_coding.py:78-126, its measured bottleneck). The C++
path (native/entropy_codec.cpp) fixes the constant factor; this module
removes the host from the hot path entirely, which matters when thousands
of tiles are encoded on-device per second:

  1. gather each symbol's code length + codeword (table lookups, VPU),
  2. exclusive prefix-sum of the lengths -> each symbol's bit offset
     (jnp.cumsum — the classic parallel-prefix entropy-coder formulation),
  3. every code contributes to at most two 32-bit output words (code
     length capped at 32); shift each codeword into a 64-bit lane aligned
     to its offset and scatter-ADD the two halves into the word buffer —
     bit-disjointness makes add equivalent to bitwise-or
     (jax.ops.segment_sum on the word index),
  4. byte-swap words to the big-endian bit order of the frame format.

The emitted frame is byte-identical to HuffmanCodec.encode (8-bit pad
header + MSB-first bits + zero pad). Ragged stream lengths stay static by
passing a fixed capacity `n` with a validity count: invalid tail symbols
contribute zero bits.

Codes longer than 32 bits (possible only for degenerate frequency tables)
are not supported on this path — callers should fall back to the host
codec; `supports_table()` checks.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_tables(codes: dict) -> Tuple[np.ndarray, np.ndarray]:
    """HuffmanCodec.codes ({symbol: bitstring}) -> (lens [n] int32,
    words [n] uint32 right-aligned)."""
    n = max(codes) + 1 if codes else 0
    lens = np.zeros(n, np.int32)
    words = np.zeros(n, np.uint32)
    for sym, code in codes.items():
        assert len(code) <= 32, "code too long for the TPU pack path"
        lens[sym] = len(code)
        words[sym] = int(code, 2) if code else 0
    return lens, words


def supports_table(codes: dict) -> bool:
    return all(len(c) <= 32 for c in codes.values())


def huffman_pack_bits(symbols: jnp.ndarray, count: jnp.ndarray,
                      lens: jnp.ndarray, words: jnp.ndarray,
                      max_words: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack `count` valid symbols into a 32-bit word buffer on device.

    Args:
      symbols: [n] int32 (entries >= count are ignored).
      count:   scalar int32, number of valid symbols.
      lens/words: code tables from pack_tables.
      max_words: static output capacity in 32-bit words
                 (>= ceil(n * max_code_len / 32)).

    Returns (payload_words [max_words] uint32 — MSB-first bit order within
    each word — and total_bits scalar int32).
    """
    n = symbols.shape[0]
    valid = jnp.arange(n) < count
    sym = jnp.where(valid, symbols, 0)
    l = jnp.where(valid, jnp.take(lens, sym), 0)          # [n] bits
    c = jnp.where(valid, jnp.take(words, sym), 0).astype(jnp.uint32)

    offsets = jnp.cumsum(l) - l                           # exclusive scan
    total_bits = offsets[-1] + l[-1] if n else jnp.int32(0)

    word_idx = offsets // 32
    bitpos = offsets % 32
    # The code occupies bit positions [bitpos, bitpos + l) of a 64-bit
    # window starting at word_idx (MSB-first). Pure uint32 split (x64 is
    # disabled, so uint64 silently truncates):
    bits_hi = jnp.clip(32 - bitpos, 0, l)                 # bits in word 0
    bits_lo = l - bits_hi                                 # bits in word 1

    def shl(x, s):   # shift-left that is 0 for s >= 32 (XLA leaves it UB)
        return jnp.where(s >= 32, 0, x << jnp.minimum(s, 31).astype(jnp.uint32))

    def shr(x, s):
        return jnp.where(s >= 32, 0, x >> jnp.minimum(s, 31).astype(jnp.uint32))

    mask_lo = jnp.where(bits_lo >= 32, jnp.uint32(0xFFFFFFFF),
                        shl(jnp.uint32(1), bits_lo) - jnp.uint32(1))
    hi = shl(shr(c, bits_lo), 32 - bitpos - bits_hi)
    lo = shl(c & mask_lo, 32 - bits_lo)

    seg_ids = jnp.concatenate([word_idx, word_idx + 1])
    vals = jnp.concatenate([hi, lo])
    # disjoint bit positions -> sum == or
    payload = jax.ops.segment_sum(vals, seg_ids, num_segments=max_words + 1,
                                  indices_are_sorted=False)
    return payload[:max_words].astype(jnp.uint32), total_bits.astype(jnp.int32)


def frame_from_words(payload: np.ndarray, total_bits: int) -> bytes:
    """Assemble the reference frame (host): pad header + payload bytes."""
    total_bits = int(total_bits)
    if total_bits == 0:
        return b""
    pad = 8 - total_bits % 8           # 1..8 (reference quirk)
    nbytes = (total_bits + pad) // 8
    raw = np.asarray(payload, np.uint32).byteswap().tobytes()  # big-endian
    body = bytearray(raw[:nbytes])
    # zero any bits past total_bits in the last partial byte (they already
    # are zero: codes were left-aligned into zeroed words)
    return bytes([pad]) + bytes(body)


def encode_on_device(symbols, lens: np.ndarray, words: np.ndarray) -> bytes:
    """Convenience one-shot: device pack + host framing, byte-identical to
    HuffmanCodec.encode."""
    symbols = np.asarray(symbols, np.int32).reshape(-1)
    if symbols.size == 0:
        return b""
    n = symbols.size
    max_words = (n * int(lens.max() if lens.size else 1) + 31) // 32 + 2
    payload, total_bits = jax.jit(
        huffman_pack_bits, static_argnames=("max_words",))(
            jnp.asarray(symbols), jnp.int32(n), jnp.asarray(lens),
            jnp.asarray(words), max_words=max_words)
    return frame_from_words(np.asarray(payload), int(total_bits))
