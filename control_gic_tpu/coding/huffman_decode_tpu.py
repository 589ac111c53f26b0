"""On-device parallel Huffman decoding (jnp, jit-friendly).

The receiver half of the parallel-prefix entropy coder. The sender packs
code bits with a cumsum-of-lengths scan (huffman_tpu.py); decoding is the
inverse problem and is inherently sequential in its textbook form — symbol
k's bit offset depends on every previous code length (the reference walks
the bitstring one bit at a time, indices_coding.py:140-168; our C++ host
decoder walks a 12-bit LUT). This module removes that serial chain with a
classic parallel formulation (list ranking by pointer doubling):

  1. build a 2^L-entry LUT mapping every L-bit window to (symbol, code
     length), L = max code length — same table the C++ decoder uses,
     resident on device,
  2. for EVERY bit position p of the padded stream, peek the L-bit window
     at p and read step[p] = code length there; f(p) = p + step[p] is the
     "next symbol boundary if a code started at p" successor function,
  3. jump-pointer doubling over f (log2(T) rounds of gathers) yields, for
     every position, the number of symbols C[p] decodable from p to the
     end; simultaneously the reachable-from-0 set A marks the TRUE symbol
     boundaries (the orbit of bit 0 under f),
  4. the k-th symbol's bit offset is the reachable p with C[0]-C[p] == k —
     one scatter; its value is one LUT gather at that offset.

Everything is dense vector work (gathers/scatters over [T] arrays), so it
vmaps over a batch of streams and fuses into the decoder's jit program:
the receiver uploads only the FEW-KB bitstreams and the index grids are
rebuilt entirely on device (the host path uploads the decoded ~230 KB
index+mask grids per Kodak image instead — the wire is the bottleneck on
a remote-attached chip).

Gating: needs all code lengths in [1, MAX_LUT_BITS]. Degenerate tables
(a zero-length code, i.e. a 1-symbol alphabet, or codes longer than
MAX_LUT_BITS) fall back to the host decoder; `supports_decode_table`
checks. Streams are assumed well-formed (byte validation — count
mismatches, CorruptStreamError — lives on the host path).

Reference behavior mirrored: CGIC/tools/indices_coding.py:140-168 (bit
walk), CGIC/models/model.py:269-389 (receiver rebuild).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# LUT size cap: 2^20 entries (4 MB int32) is cheap in HBM; realistic
# trained tables (1024 symbols, smooth counters) peak well below this.
MAX_LUT_BITS = 20


def build_decode_lut(codes: dict) -> Tuple[np.ndarray, np.ndarray, int]:
    """HuffmanCodec.codes ({symbol: bitstring}) -> (lut_sym [2^L] int32,
    lut_len [2^L] int32, L). Every L-bit window whose prefix is symbol s's
    code maps to (s, len(code))."""
    max_len = max((len(c) for c in codes.values()), default=0)
    assert 1 <= max_len <= MAX_LUT_BITS, max_len
    size = 1 << max_len
    lut_sym = np.zeros(size, np.int32)
    lut_len = np.ones(size, np.int32)   # len>=1 keeps f() strictly advancing
    for sym, code in codes.items():
        l = len(code)
        assert l >= 1
        base = int(code, 2) << (max_len - l)
        lut_sym[base:base + (1 << (max_len - l))] = sym
        lut_len[base:base + (1 << (max_len - l))] = l
    return lut_sym, lut_len, max_len


def supports_decode_table(codes: dict) -> bool:
    return (len(codes) > 0
            and all(1 <= len(c) <= MAX_LUT_BITS for c in codes.values()))


def _shl(x, s):
    """uint32 shift-left, 0 for s >= 32 (XLA leaves oversized shifts UB)."""
    return jnp.where(s >= 32, jnp.uint32(0),
                     x << jnp.minimum(s, 31).astype(jnp.uint32))


def _shr(x, s):
    return jnp.where(s >= 32, jnp.uint32(0),
                     x >> jnp.minimum(s, 31).astype(jnp.uint32))


def peek_windows(payload: jnp.ndarray, positions: jnp.ndarray,
                 nbits: int) -> jnp.ndarray:
    """Read the `nbits`-bit window starting at each bit position (MSB-first
    word order, as packed by huffman_pack_bits). payload must have one
    guard word past the last addressable position."""
    wi = positions >> 5
    bo = (positions & 31).astype(jnp.uint32)
    w0 = jnp.take(payload, wi)
    w1 = jnp.take(payload, wi + 1)
    window = _shl(w0, bo) | jnp.where(bo == 0, jnp.uint32(0),
                                      _shr(w1, 32 - bo))
    return _shr(window, jnp.uint32(32 - nbits)).astype(jnp.int32)


def huffman_decode_bits(payload: jnp.ndarray, count: jnp.ndarray,
                        lut_sym: jnp.ndarray, lut_len: jnp.ndarray,
                        n_cap: int, max_len: int) -> jnp.ndarray:
    """Decode `count` symbols from a packed bitstream, fully in parallel.

    Args:
      payload: [W] uint32, MSB-first bit order (frame body without the pad
        header, big-endian-byteswapped to words). Needs >= 1 guard word
        beyond ceil(n_cap*max_len/32) — callers pad.
      count: scalar int32 — number of valid symbols (<= n_cap).
      lut_sym/lut_len: tables from build_decode_lut.
      n_cap: static symbol capacity (the full subsampled grid size).
      max_len: static L of the LUT.

    Returns symbols [n_cap] int32; entries >= count are 0.
    """
    T = n_cap * max_len                       # bit-position space
    if n_cap == 0:
        return jnp.zeros((0,), jnp.int32)
    p = jnp.arange(T, dtype=jnp.int32)
    idx = peek_windows(payload, p, max_len)
    step = jnp.take(lut_len, idx)             # [T] code length at p (>=1)

    # successor with sink T: f[T] = T
    f = jnp.minimum(p + step, T)
    f = jnp.concatenate([f, jnp.int32(T)[None]])          # [T+1]
    c = jnp.concatenate([jnp.ones(T, jnp.int32),
                         jnp.zeros(1, jnp.int32)])        # symbols from p
    a = jnp.zeros(T + 1, jnp.bool_).at[0].set(True)       # orbit of 0

    # pointer doubling: after round k, f = succ^(2^(k+1)), c[p] counts
    # symbols over that horizon, a marks {succ^m(0) : m < 2^(k+1)}
    rounds = max(int(np.ceil(np.log2(max(T, 2)))), 1)
    for _ in range(rounds):
        a = a.at[f].max(a, mode="drop")
        c = c + jnp.take(c, f)
        f = jnp.take(f, f)

    # boundary p holds symbol index k = C[0] - C[p]
    k = c[0] - c
    valid = a & (k >= 0) & (k < n_cap)
    valid = valid.at[T].set(False)            # the sink is not a symbol
    scatter_idx = jnp.where(valid, k, n_cap)  # invalid -> overflow slot
    offsets = jnp.zeros(n_cap + 1, jnp.int32).at[scatter_idx].set(
        jnp.arange(T + 1, dtype=jnp.int32), mode="drop")[:n_cap]

    syms = jnp.take(lut_sym, peek_windows(payload, offsets, max_len))
    return jnp.where(jnp.arange(n_cap) < count, syms, 0).astype(jnp.int32)


def huffman_decode_bits_scan(payloads: jnp.ndarray, counts: jnp.ndarray,
                             lut_sym: jnp.ndarray, lut_len: jnp.ndarray,
                             n_cap: int, max_len: int,
                             unroll: int = 8) -> jnp.ndarray:
    """Batched sequential LUT-walk: decode S streams in lock-step lanes.

    The list-ranking decoder (huffman_decode_bits) is fully parallel but
    leans on large arbitrary gathers/scatters, which TPUs execute slowly
    (measured ~0.7 s/batch at the 256² codec shape — worse than the wire
    bytes it saves). This variant accepts the serial chain over SYMBOLS
    but keeps each step tiny: an S-lane window peek + S-lane LUT gather,
    with decoded symbols emitted as scan outputs (no scatter at all).
    `unroll` symbols are decoded per scan step to amortize the loop
    overhead — measured on-chip (v5e, 32 lanes, 4096-symbol fine grid):
    168 ms at unroll=1 -> ~35 ms at unroll=8 (incl. dispatch RTT).

    Args:
      payloads: [S, W] uint32 word blocks (guard word included).
      counts:   [S] int32 valid-symbol counts.
    Returns symbols [S, n_cap] int32, zero beyond each stream's count.
    """
    s, _ = payloads.shape
    if n_cap == 0:
        return jnp.zeros((s, 0), jnp.int32)
    t_max = jnp.int32(n_cap * max_len)   # clamp: tail lanes re-read garbage

    def one(off):
        wi = off >> 5
        bo = (off & 31).astype(jnp.uint32)
        w0 = jnp.take_along_axis(payloads, wi[:, None], axis=1)[:, 0]
        w1 = jnp.take_along_axis(payloads, wi[:, None] + 1, axis=1)[:, 0]
        window = _shl(w0, bo) | jnp.where(bo == 0, jnp.uint32(0),
                                          _shr(w1, 32 - bo))
        idx = _shr(window, jnp.uint32(32 - max_len)).astype(jnp.int32)
        nxt = jnp.minimum(off + jnp.take(lut_len, idx), t_max)
        return nxt, jnp.take(lut_sym, idx)

    unroll = max(1, min(unroll, n_cap))

    def step(off, _):
        syms = []
        for _ in range(unroll):
            off, sym = one(off)
            syms.append(sym)
        return off, jnp.stack(syms)                      # [unroll, S]

    steps = (n_cap + unroll - 1) // unroll
    _, ys = jax.lax.scan(step, jnp.zeros((s,), jnp.int32), None,
                         length=steps)
    syms = ys.reshape(steps * unroll, s)[:n_cap].T       # [S, n_cap]
    return jnp.where(jnp.arange(n_cap)[None, :] < counts[:, None],
                     syms, 0).astype(jnp.int32)


def bitmap_decode_bits(payload: jnp.ndarray, n: int) -> jnp.ndarray:
    """Unpack an n-bit bitmap (1 bit/element, MSB-first — the mask frame
    format, mask_coding.py:14-38) to [n] int32. Fully vectorized."""
    p = jnp.arange(n, dtype=jnp.int32)
    w = jnp.take(payload, p >> 5)
    return ((w >> (31 - (p & 31)).astype(jnp.uint32)) & 1).astype(jnp.int32)


def frame_body_words(frame: bytes) -> Tuple[np.ndarray, int]:
    """Host: strip the 8-bit pad header, return the compact payload words
    (uint32, MSB-first bit order — big-endian byteswap of the body bytes)
    and total_bits. The single inversion of frame_from_words' framing."""
    if len(frame) == 0:
        return np.zeros(0, np.uint32), 0
    pad = frame[0]
    assert 1 <= pad <= 8, pad
    body = frame[1:]
    total_bits = len(body) * 8 - pad
    raw = body + b"\x00" * (-len(body) % 4)
    return np.frombuffer(raw, np.uint32).byteswap(), total_bits


def words_from_frame(frame: bytes, cap_words: int) -> Tuple[np.ndarray, int]:
    """frame_body_words zero-padded to a fixed [cap_words] buffer."""
    words, total_bits = frame_body_words(frame)
    assert words.size <= cap_words, (words.size, cap_words)
    out = np.zeros(cap_words, np.uint32)
    out[:words.size] = words
    return out, total_bits
