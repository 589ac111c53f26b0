"""Entropy-coding tests: internal round-trips, C++ vs Python parity, and
byte-exact cross-validation against the reference coder (imported from the
read-only mount as a behavioral oracle when present)."""
import os

import numpy as np
import pytest

from control_gic_tpu.coding import HuffmanCodec, BitmapCodec, build_huffman_codes
from control_gic_tpu.coding.native_lib import get_native

REF = "/root/reference"


def _random_freqs(rng, n=1024, zero_frac=0.3):
    freqs = rng.integers(0, 10_000, size=n)
    freqs[rng.random(n) < zero_frac] = 0
    return {i: int(f) for i, f in enumerate(freqs)}


def test_codes_are_prefix_free(rng):
    codes = build_huffman_codes(_random_freqs(rng))
    assert len(codes) == 1024
    values = sorted(codes.values(), key=len)
    for i, a in enumerate(values):
        for b in values[i + 1:]:
            assert not b.startswith(a), (a, b)


def test_roundtrip_random_streams(rng):
    codec = HuffmanCodec(_random_freqs(rng))
    for size in [1, 7, 256, 4096]:
        syms = rng.integers(0, 1024, size=size).astype(np.int32)
        data = codec.encode(syms)
        out = codec.decode(data)
        np.testing.assert_array_equal(np.asarray(out), syms)


def test_empty_stream_contract(rng):
    codec = HuffmanCodec(_random_freqs(rng))
    assert codec.encode([]) == b""
    assert codec.decode(b"") is None


def test_native_matches_python(rng):
    native = get_native()
    assert native is not None, "C++ codec failed to build"
    codec = HuffmanCodec(_random_freqs(rng))
    syms = rng.integers(0, 1024, size=1000).astype(np.int32)
    enc_native = native.huff_encode(syms, codec.lens, codec.code_bytes)
    bits = "".join(codec.codes[int(s)] for s in syms)
    from control_gic_tpu.coding.huffman import _frame_bits
    assert enc_native == _frame_bits(bits)
    dec = native.huff_decode(enc_native, codec.trie)
    np.testing.assert_array_equal(dec, syms)


def test_native_fast_paths_match_python(rng):
    """The C++ codec's round-2 fast paths — 64-bit-accumulator encode, K-bit
    LUT decode on streams past the size threshold, and the bit-by-bit
    fallbacks for >57-bit codes / >LUT-bit codes — must stay byte- and
    symbol-identical to the pure-Python oracle."""
    native = get_native()
    assert native is not None, "C++ codec failed to build"
    # Fibonacci-skewed counts force code lengths far beyond both the 12-bit
    # decode LUT and the 57-bit fast-encode limit.
    fib = [1, 1]
    for _ in range(198):
        fib.append(min(fib[-1] + fib[-2], 10**17))
    tables = {
        "uniform": {i: 5 for i in range(1024)},
        "zipf": {i: int(1e7 / (i + 1) ** 1.3) + 1 for i in range(1024)},
        "fib_longcodes": {i: int(f) for i, f in enumerate(fib)},
    }
    for name, freqs in tables.items():
        codec = HuffmanCodec(freqs)
        n_sym = len(freqs)
        # sizes straddle the LUT engage threshold (2^14 payload bits)
        for size in [1, 500, 3000, 60_000]:
            syms = rng.integers(0, n_sym, size=size).astype(np.int32)
            if name == "fib_longcodes":
                # make long codes actually appear: rare symbols have them
                syms[rng.random(size) < 0.2] = 0
            codec._native = native
            enc_n = codec.encode(syms)
            dec_n = codec.decode(enc_n)
            codec._native = None
            enc_p = codec.encode(syms)
            dec_p = codec.decode(enc_p)
            assert enc_n == enc_p, (name, size)
            assert dec_n == dec_p == syms.tolist(), (name, size)


def test_bitmap_roundtrip(rng):
    codec = BitmapCodec()
    for size in [1, 8, 256, 1024, 1023]:
        bits = rng.integers(0, 2, size=size)
        data = codec.encode(bits)
        # frame size: header + ceil; pad rule gives 8 extra bits when aligned
        pad = 8 - size % 8
        assert len(data) == 1 + (size + pad) // 8
        np.testing.assert_array_equal(codec.decode(data), bits)
    assert codec.encode([]) == b""
    assert codec.decode(b"") is None


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_byte_exact_vs_reference_huffman(rng, tmp_path):
    """Same frequency table -> identical Huffman tree, codes and frames as
    the reference implementation (including heapq tie behavior)."""
    import sys
    sys.path.insert(0, REF)
    import torch
    from CGIC.tools.indices_coding import HuffmanCoding as RefHuffman

    freqs = _random_freqs(rng)
    ref_freq_dict = {str(i): torch.tensor([float(f)]) for i, f in freqs.items()}
    ref = RefHuffman(ref_freq_dict)
    ours = HuffmanCodec(freqs)
    assert ref.codes == ours.codes

    syms = rng.integers(0, 1024, size=4096).astype(np.int32)
    ref_path = ref.compress(torch.tensor(syms), str(tmp_path / "ref.bin"))
    with open(ref_path, "rb") as f:
        ref_bytes = f.read()
    assert ours.encode(syms) == ref_bytes
    assert ours.decode(ref_bytes) == ref.decompress_string(ref_path)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_byte_exact_vs_reference_bitmap(rng, tmp_path):
    import sys
    sys.path.insert(0, REF)
    import torch
    from CGIC.tools.mask_coding import BinaryCoding as RefBinary

    ref = RefBinary()
    ours = BitmapCodec()
    bits = rng.integers(0, 2, size=256)
    ref_path = ref.compress(torch.tensor(bits), str(tmp_path / "mask.bin"))
    with open(ref_path, "rb") as f:
        ref_bytes = f.read()
    assert ours.encode(bits) == ref_bytes
    np.testing.assert_array_equal(ours.decode(ref_bytes),
                                  ref.decompress_string(ref_path))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_from_counts_matches_parameterdict_order(rng):
    """The runtime reference builds its heap by iterating an
    nn.ParameterDict (quantize.py:28, inference.py:137-139), whose key
    order is LEXICOGRAPHIC ("0","1","10",...), not numeric — heap ties
    resolve differently than for a plain insertion-ordered dict.
    from_counts must replicate that order for byte-identical streams."""
    import sys
    sys.path.insert(0, REF)
    import torch
    from torch import nn
    from CGIC.tools.indices_coding import HuffmanCoding as RefHuffman

    n = 256
    # heavy ties to exercise insertion-order-dependent tie-breaking
    counts = rng.integers(1, 8, size=n).astype(np.int64)
    pd = nn.ParameterDict({str(i): nn.Parameter(torch.zeros(1))
                           for i in range(n)}).requires_grad_(False)
    with torch.no_grad():
        for i in range(n):
            pd[str(i)].copy_(torch.tensor([float(counts[i])]))
    assert list(pd.keys()) == sorted(str(i) for i in range(n)), \
        "torch ParameterDict no longer sorts keys; revisit from_counts"
    ref = RefHuffman(pd)
    ours = HuffmanCodec.from_counts(counts)
    assert ours.codes == ref.codes
    syms = rng.integers(0, n, size=2048).astype(np.int32)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = ref.compress(torch.tensor(syms), os.path.join(d, "s.bin"))
        with open(p, "rb") as f:
            assert ours.encode(syms) == f.read()


def test_degenerate_zero_tail_counters_roundtrip():
    """Counters with a long zero tail (a briefly-trained codebook) chain
    unused symbols into codes of many hundreds of bits — beyond the C++
    encoder's 32-byte stride. The codec must still round-trip (Python
    encode path + trie decode); found live by training 1200 steps then
    running the infer CLI (round 4)."""
    import numpy as np
    from control_gic_tpu.coding import HuffmanCodec

    counts = np.zeros(1024, np.int64)
    counts[:40] = np.arange(1, 41)          # only 40 codes ever used
    h = HuffmanCodec.from_counts(counts)
    max_len = max(len(c) for c in h.codes.values())
    assert max_len > 256, max_len           # the degenerate regime
    syms = np.asarray([0, 5, 39, 1, 39, 0], np.int64)
    frame = h.encode(syms)
    assert h.decode(frame) == list(syms)
    # a rare-symbol stream (one of the absurdly long codes) works too
    h2 = HuffmanCodec.from_counts(
        np.concatenate([[1000, 900], np.zeros(1022, np.int64)]))
    rare = max(h2.codes, key=lambda s: len(h2.codes[s]))
    frame2 = h2.encode(np.asarray([rare, 0, rare]))
    assert h2.decode(frame2) == [rare, 0, rare]
