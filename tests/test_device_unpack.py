"""Device-unpack receiver: the on-device parallel Huffman decode + mask/
grid rebuild must match the validated host receiver exactly, across all 7
compression modes (VERDICT r3 item 5 — closes the sender/receiver
asymmetry: the H2D upload becomes the compressed bitstreams, not the
decoded grids).

Reference behavior: receiver rebuild CGIC/models/model.py:269-389; bit
walk CGIC/tools/indices_coding.py:140-168."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from control_gic_tpu.coding import BitmapCodec, HuffmanCodec
from control_gic_tpu.coding.huffman_decode_tpu import (
    MAX_LUT_BITS, bitmap_decode_bits, build_decode_lut, huffman_decode_bits,
    supports_decode_table, words_from_frame)
from control_gic_tpu.codec import CGICCodec
from control_gic_tpu.models import CGIC, CGICConfig

from test_codec import TINY, RATIOS, codec, rng_module  # noqa: F401


def test_parallel_decode_matches_host_coder(rng_module):  # noqa: F811
    """LUT-walk list-ranking decode == host codec, across table skews and
    stream lengths (incl. empty and single-symbol streams)."""
    rng = rng_module
    for skew in (1.0, 50.0):
        counts = np.maximum(
            rng.poisson(100 * skew ** rng.uniform(-1, 1, 256), 256),
            1).astype(np.int64)
        h = HuffmanCodec.from_counts(counts)
        assert supports_decode_table(h.codes)
        lut_sym, lut_len, L = build_decode_lut(h.codes)
        fn = jax.jit(huffman_decode_bits,
                     static_argnames=("n_cap", "max_len"))
        for n in (0, 1, 13, 512):
            syms = rng.integers(0, 256, n).astype(np.int64)
            frame = h.encode(syms)
            n_cap = 512
            cap_words = (n_cap * L + 31) // 32 + 2
            words, _ = words_from_frame(frame, cap_words)
            out = fn(jnp.asarray(words), jnp.int32(n), jnp.asarray(lut_sym),
                     jnp.asarray(lut_len), n_cap=n_cap, max_len=L)
            assert np.array_equal(np.asarray(out)[:n], syms)
            assert not np.asarray(out)[n:].any()


def test_scan_decoder_matches_host_coder(rng_module):  # noqa: F811
    """The batched lock-step scan decoder (the TPU-fast path) equals the
    host codec lane-for-lane, with ragged per-lane counts."""
    from control_gic_tpu.coding.huffman_decode_tpu import (
        huffman_decode_bits_scan)
    rng = rng_module
    counts = np.maximum(rng.poisson(80, 128), 1).astype(np.int64)
    h = HuffmanCodec.from_counts(counts)
    lut_sym, lut_len, L = build_decode_lut(h.codes)
    n_cap = 100
    cap_words = (n_cap * L + 31) // 32 + 2
    lane_counts = [0, 1, 37, 100]
    payloads, syms_in = [], []
    for n in lane_counts:
        syms = rng.integers(0, 128, n).astype(np.int64)
        words, _ = words_from_frame(h.encode(syms), cap_words)
        payloads.append(words)
        syms_in.append(syms)
    out = jax.jit(huffman_decode_bits_scan,
                  static_argnames=("n_cap", "max_len"))(
        jnp.asarray(np.stack(payloads)),
        jnp.asarray(np.asarray(lane_counts, np.int32)),
        jnp.asarray(lut_sym), jnp.asarray(lut_len),
        n_cap=n_cap, max_len=L)
    out = np.asarray(out)
    for lane, (n, syms) in enumerate(zip(lane_counts, syms_in)):
        assert np.array_equal(out[lane, :n], syms)
        assert not out[lane, n:].any()


def test_unpack_impls_agree(codec, rng_module, monkeypatch):  # noqa: F811
    """'scan' (TPU-fast) and 'rank' (fully parallel) receiver impls produce
    identical reconstructions; the host path is the oracle."""
    imgs = rng_module.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    encs = codec.encode_batch(imgs, 0.1, 0.4, device_pack=True)
    host = codec.decode_batch(encs)
    for impl in ("scan", "rank"):
        monkeypatch.setenv("CONTROL_GIC_UNPACK_IMPL", impl)
        dev = codec.decode_batch(encs, device_unpack=True)
        np.testing.assert_allclose(dev, host, atol=1e-6, err_msg=impl)


def test_bitmap_decode_matches_host(rng_module):  # noqa: F811
    b = BitmapCodec()
    for n in (1, 31, 32, 100):
        bits = rng_module.integers(0, 2, n).astype(np.int64)
        words, _ = words_from_frame(b.encode(bits), n // 32 + 2)
        got = np.asarray(bitmap_decode_bits(jnp.asarray(words), n))
        assert np.array_equal(got, bits)


def test_decode_lut_gate():
    # one-symbol alphabet -> zero-length code -> host fallback
    h = HuffmanCodec.from_counts(np.array([5]))
    assert not supports_decode_table(h.codes)
    assert MAX_LUT_BITS >= 16


@pytest.mark.parametrize("ratios", RATIOS)
def test_device_unpack_matches_host_receiver(codec, rng_module,  # noqa: F811
                                             ratios):
    """decode_batch(device_unpack=True) is pixel-identical to the host
    receiver for every compression mode, on a per-sample-routed batch."""
    rc, rm = ratios
    imgs = rng_module.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    encs = codec.encode_batch(imgs, rc, rm, device_pack=True)
    host = codec.decode_batch(encs)
    dev = codec.decode_batch(encs, device_unpack=True)
    np.testing.assert_allclose(dev, host, atol=1e-6)
    # uint8 output path: identical quantized bytes
    host8 = codec.decode_batch(encs, out_uint8=True)
    dev8 = codec.decode_batch(encs, out_uint8=True, device_unpack=True)
    assert np.array_equal(dev8, host8)


def test_pipelined_device_unpack_matches(codec, rng_module):  # noqa: F811
    batches = [rng_module.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
               for _ in range(3)]
    recs_h, encs_h = codec.roundtrip_pipelined(batches, 0.1, 0.4,
                                               device_pack=True)
    recs_d, encs_d = codec.roundtrip_pipelined(batches, 0.1, 0.4,
                                               device_pack=True,
                                               device_unpack=True,
                                               threads=True)
    for a, b in zip(encs_h, encs_d):
        assert [e.streams for e in a] == [e.streams for e in b]
    for a, b in zip(recs_h, recs_d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)
    st = codec.last_pipeline_stats
    assert st["b_h2d_bytes"] > 0


def test_device_unpack_wire_bytes_are_compressed_size(codec,  # noqa: F811
                                                      rng_module):
    """The flat upload is proportional to the compressed payload, far below
    the host path's decoded-grid upload."""
    imgs = rng_module.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    encs = codec.encode_batch(imgs, 0.1, 0.4, device_pack=True)
    flat, offs = codec._flat_stream_upload(encs)
    payload = sum(e.num_bytes for e in encs)
    grid_bytes = codec._compact_decode_input(
        encs, [np.zeros((16, 16), np.int64) for _ in encs]).nbytes
    # payload + per-stream guard/word padding + the size-bucket floor
    # (buckets avoid per-compressed-size recompiles; min bucket 4 KB)
    raw = payload + 4 * len(encs) * len(offs[0]) + 512
    assert flat.nbytes <= max(int(raw * 1.25) + 1024, 4096)
    # the logical upload (pre-bucket) is compressed-size-proportional,
    # below even the COMPACT host upload (uint16 grid + bitmap masks);
    # at this toy 16x16 latent the 4 KB minimum bucket dominates
    # flat.nbytes, so compare `raw`
    assert raw + offs.nbytes < grid_bytes
