"""On-device parallel-prefix Huffman pack == host codec, byte for byte."""
import numpy as np

from control_gic_tpu.coding import HuffmanCodec
from control_gic_tpu.coding.huffman_tpu import (encode_on_device, pack_tables,
                                                supports_table)


def _codec(rng, n=1024):
    # all-positive frequencies: zero-frequency symbols can chain into codes
    # longer than 32 bits, which the device path deliberately rejects
    freqs = rng.integers(1, 10_000, size=n)
    return HuffmanCodec({i: int(f) for i, f in enumerate(freqs)})


def test_zero_heavy_table_falls_back(rng):
    freqs = rng.integers(0, 10_000, size=1024)
    freqs[rng.random(1024) < 0.5] = 0
    codec = HuffmanCodec({i: int(f) for i, f in enumerate(freqs)})
    max_len = max(len(c) for c in codec.codes.values())
    if max_len > 32:
        assert not supports_table(codec.codes)
    else:
        assert supports_table(codec.codes)


def test_device_pack_matches_host(rng):
    codec = _codec(rng)
    assert supports_table(codec.codes)
    lens, words = pack_tables(codec.codes)
    for size in [1, 5, 8, 255, 4096]:
        syms = rng.integers(0, 1024, size=size).astype(np.int32)
        host = codec.encode(syms)
        dev = encode_on_device(syms, lens, words)
        assert dev == host, f"mismatch at size {size}"


def test_device_pack_empty(rng):
    codec = _codec(rng)
    lens, words = pack_tables(codec.codes)
    assert encode_on_device(np.zeros(0, np.int32), lens, words) == b""


def test_device_pack_roundtrips_through_decoder(rng):
    codec = _codec(rng)
    lens, words = pack_tables(codec.codes)
    syms = rng.integers(0, 1024, size=777).astype(np.int32)
    data = encode_on_device(syms, lens, words)
    np.testing.assert_array_equal(codec.decode(data), syms)
