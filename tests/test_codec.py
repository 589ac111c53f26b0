"""Codec round-trip tests: the receiver's rebuilt index grid and masks must
be bit-exact vs the sender's, across all 7 compression modes, through real
bitstream files."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from control_gic_tpu.codec import CGICCodec, EncodedImage, MODE_STREAMS
from control_gic_tpu.models import CGIC, CGICConfig

TINY = CGICConfig(n_embed=32, embed_dim=4, z_channels=4, ch=32,
                  ch_mult=(1, 1, 2, 2, 2), num_res_blocks=1,
                  attn_resolutions=(8,), resolution=64)

RATIOS = [(0.1, 0.4), (0.0, 0.8), (0.3, 0.0), (0.5, 0.5),
          (1.0, 0.0), (0.0, 1.0), (0.0, 0.0)]


@pytest.fixture(scope="module")
def codec(rng_module):
    model = CGIC(TINY)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, 0.1, 0.4)
    counts = rng_module.integers(0, 1000, size=TINY.n_embed)
    return CGICCodec(model, variables, counts)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(7)


def test_roundtrip_all_modes(codec, rng_module, tmp_path):
    img = rng_module.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    for i, (rc, rm) in enumerate(RATIOS):
        enc = codec.encode(img, rc, rm)
        assert enc.mode == i
        assert set(enc.streams) == set(MODE_STREAMS[i])

        # ground truth from the encoder
        fn = codec._encode_fn(rc, rm)
        out = fn(codec.variables, jnp.asarray(img)[None])
        ind_true = np.asarray(out.indices[0])
        masks_true = [np.asarray(m[0]) for m in out.router.masks]

        # through files
        d = tmp_path / f"mode{i}"
        enc.write(str(d))
        enc2 = EncodedImage.read(str(d), enc.mode, enc.latent_hw, enc.image_hw)
        ind, masks = codec._rebuild(enc2)

        np.testing.assert_array_equal(masks[0], masks_true[0])
        np.testing.assert_array_equal(masks[1], masks_true[1])
        np.testing.assert_array_equal(masks[2], masks_true[2])
        # index parity holds wherever a stream carried the value; positions
        # not covered by any transmitted grain (impossible by partition) —
        # full equality expected:
        np.testing.assert_array_equal(ind, ind_true)

        assert enc.bpp > 0
        rec = codec.decode(enc2)
        assert rec.shape == (64, 64, 3)
        assert np.isfinite(rec).all()


def test_compress_matches_manual_decode(codec, rng_module, tmp_path):
    img = rng_module.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    rec, bpp, enc = codec.compress(img, 0.1, 0.4, out_dir=str(tmp_path / "s"))
    rec2 = codec.decode(enc)
    np.testing.assert_allclose(rec, rec2, atol=1e-6)
    # bpp equals total written bytes * 8 / pixels
    import os
    total = sum(os.path.getsize(tmp_path / "s" / f)
                for f in os.listdir(tmp_path / "s"))
    assert bpp == pytest.approx(total * 8 / (64 * 64))


def test_nondivisible_16_rejected(codec):
    with pytest.raises(AssertionError):
        codec.encode(np.zeros((60, 64, 3), np.float32), 0.1, 0.4)


def test_roundtrip_pipelined_matches_serial(codec, rng_module):
    """The software-pipelined loop produces byte-identical bundles and the
    same reconstructions as serial encode_batch/decode_batch, for both the
    host and device_pack entropy paths."""
    batches = [rng_module.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
               for _ in range(3)]
    for device_pack in (False, True):
        recs_p, encs_p = codec.roundtrip_pipelined(
            batches, 0.1, 0.4, device_pack=device_pack)
        assert len(recs_p) == len(encs_p) == len(batches)
        for b, rec_p, enc_p in zip(batches, recs_p, encs_p):
            encs_s = codec.encode_batch(b, 0.1, 0.4, device_pack=device_pack)
            rec_s = codec.decode_batch(encs_s)
            assert [e.streams for e in encs_s] == [e.streams for e in enc_p]
            assert [e.mode for e in encs_s] == [e.mode for e in enc_p]
            np.testing.assert_allclose(np.asarray(rec_p), rec_s, atol=1e-6)


def test_roundtrip_pipelined_empty(codec):
    recs, encs = codec.roundtrip_pipelined([], 0.1, 0.4)
    assert recs == [] and encs == []


def test_roundtrip_threaded_matches_serial(codec, rng_module):
    """The threaded three-stage pipeline (auto-on for accelerator backends;
    forced here on CPU) is byte- and pixel-identical to the serial path."""
    batches = [rng_module.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
               for _ in range(4)]
    recs_t, encs_t = codec.roundtrip_pipelined(
        batches, 0.1, 0.4, device_pack=True, threads=True)
    assert len(recs_t) == len(encs_t) == len(batches)
    for b, rec_t, enc_t in zip(batches, recs_t, encs_t):
        encs_s = codec.encode_batch(b, 0.1, 0.4, device_pack=True)
        rec_s = codec.decode_batch(encs_s)
        assert [e.streams for e in encs_s] == [e.streams for e in enc_t]
        np.testing.assert_allclose(np.asarray(rec_t), rec_s, atol=1e-6)
    # self-attribution record: stage seconds + byte counts were collected
    st = codec.last_pipeline_stats
    assert st["threaded"] == 1.0 and st["wall_s"] > 0
    for k in ("a_upload_s", "b_fetch_s", "b_frame_s", "b_rebuild_s",
              "b_h2d_dispatch_s", "c_fetch_s", "b_fetch_bytes",
              "b_h2d_bytes"):
        assert k in st, k


def test_uint8_input_matches_float(codec, rng_module):
    """uint8 H2D path: on-device x/255 is bit-identical to host float/255
    (same single-rounding conversion ToTensor performs)."""
    img8 = (rng_module.uniform(0, 1, (2, 64, 64, 3)) * 255).astype(np.uint8)
    imgf = img8.astype(np.float32) / 255.0
    encs_f = codec.encode_batch(imgf, 0.1, 0.4)
    encs_8 = codec.encode_batch(img8, 0.1, 0.4)
    for a, b in zip(encs_f, encs_8):
        assert a.streams == b.streams
    # device_pack path too
    encs_8p = codec.encode_batch(img8, 0.1, 0.4, device_pack=True)
    for a, b in zip(encs_f, encs_8p):
        assert a.streams == b.streams


def test_uint8_output_matches_save_png_quantization(codec, rng_module):
    img = rng_module.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    encs = codec.encode_batch(img, 0.1, 0.4)
    rec_f = codec.decode_batch(encs)
    rec_8 = codec.decode_batch(encs, out_uint8=True)
    assert rec_8.dtype == np.uint8
    want = (np.clip(rec_f, 0.0, 1.0) * 255).astype(np.uint8)
    # identical up to f32-vs-device rounding at exact integer boundaries
    diff = np.abs(rec_8.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3
