"""Device-side stream packing must be byte-identical to the host coders.

The fused encode+pack program (codec.encode*/device_pack=True) replaces the
host boolean-gather + Python/C++ bit packing; every frame it emits must
match HuffmanCodec/BitmapCodec byte-for-byte, including empty streams.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from control_gic_tpu.codec import CGICCodec, MODE_STREAMS
from control_gic_tpu.coding import (BitmapCodec, HuffmanCodec,
                                    compact_masked, pack_streams_batch,
                                    pack_tables, streams_to_bytes)
from control_gic_tpu.models import CGIC, CGICConfig
from control_gic_tpu.ops.router import mode_from_ratios

TINY = CGICConfig(n_embed=32, embed_dim=4, z_channels=4, ch=32,
                  ch_mult=(1, 1, 2, 2, 2), num_res_blocks=1,
                  attn_resolutions=(8,), resolution=64)


@pytest.fixture(scope="module")
def codec():
    model = CGIC(TINY)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, 0.1, 0.4)
    counts = np.random.default_rng(7).integers(0, 1000, size=TINY.n_embed)
    return CGICCodec(model, variables, counts)


def test_compact_masked_matches_boolean_gather(rng):
    vals = jnp.asarray(rng.integers(0, 100, (3, 64)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (3, 64)), jnp.int32)
    out, count = jax.jit(compact_masked)(vals, mask)
    out, count = np.asarray(out), np.asarray(count)
    for i in range(3):
        want = np.asarray(vals[i])[np.asarray(mask[i]) == 1]
        assert count[i] == want.size
        np.testing.assert_array_equal(out[i, :count[i]], want)


def test_pack_streams_batch_oracle(rng):
    """pack_streams_batch vs host coders on hand-made grids, all modes."""
    counts = rng.integers(1, 500, size=16)
    huff = HuffmanCodec.from_counts(counts)
    bitmap = BitmapCodec()
    lens, words = pack_tables(huff.codes)

    b, hl, wl = 2, 8, 8
    ind = rng.integers(0, 16, (b, hl, wl)).astype(np.int32)
    m_c = rng.integers(0, 2, (b, hl // 4, wl // 4)).astype(np.int32)
    # a partition: medium where not coarse (on the medium grid), fine rest
    m_m = (1 - m_c.repeat(2, 1).repeat(2, 2)) * rng.integers(
        0, 2, (b, hl // 2, wl // 2))
    m_f = 1 - m_m.repeat(2, 1).repeat(2, 2) - m_c.repeat(4, 1).repeat(4, 2)

    for mode in range(7):
        packed = jax.jit(
            lambda i, ms: pack_streams_batch(i, ms, mode, lens, words,
                                             int(lens.max())),
        )(jnp.asarray(ind), tuple(jnp.asarray(m) for m in
                                  (m_c, m_m, m_f)))
        packed = {k: (np.asarray(p), np.asarray(t))
                  for k, (p, t) in packed.items()}
        assert set(packed) == set(MODE_STREAMS[mode])
        for i in range(b):
            got = streams_to_bytes(packed, i)
            if "indices_coarse" in got:
                sel = (ind[i, ::4, ::4][m_c[i] == 1] if mode != 4
                       else ind[i, ::4, ::4].reshape(-1))
                assert got["indices_coarse"] == huff.encode(sel)
            if "indices_medium" in got:
                sel = (ind[i, ::2, ::2][m_m[i] == 1] if mode != 5
                       else ind[i, ::2, ::2].reshape(-1))
                assert got["indices_medium"] == huff.encode(sel)
            if "indices_fine" in got:
                sel = (ind[i][m_f[i] == 1] if mode != 6
                       else ind[i].reshape(-1))
                assert got["indices_fine"] == huff.encode(sel)
            if "mask_coarse" in got:
                assert got["mask_coarse"] == bitmap.encode(
                    m_c[i].reshape(-1))
            if "mask_medium" in got:
                assert got["mask_medium"] == bitmap.encode(
                    m_m[i].reshape(-1))


@pytest.mark.parametrize("rc,rm", [
    (0.1, 0.4),     # mode 0
    (0.05, 0.4),    # mode 0 with an EMPTY coarse stream (k_c rounds to 1,
                    # strict < selects nothing)
    (0.0, 0.8),     # mode 1
    (1.0, 0.0),     # mode 4 (single stream, no masks)
])
def test_device_pack_matches_host_path(codec, rng, rc, rm):
    imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    host = codec.encode_batch(imgs, rc, rm)
    dev = codec.encode_batch(imgs, rc, rm, device_pack=True)
    assert len(host) == len(dev) == 2
    for eh, ed in zip(host, dev):
        assert eh.mode == ed.mode == mode_from_ratios(rc, rm)
        assert ed.latent_hw == eh.latent_hw
        assert set(eh.streams) == set(ed.streams)
        for name in eh.streams:
            assert eh.streams[name] == ed.streams[name], name
    # single-image path too (batch-global routing, B=1 equivalent)
    e1 = codec.encode(imgs[0], rc, rm)
    e2 = codec.encode(imgs[0], rc, rm, device_pack=True)
    assert e1.streams == e2.streams


def test_device_pack_decodes(codec, rng):
    """A device-packed bundle feeds the normal receiver unchanged."""
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    enc = codec.encode(img, 0.1, 0.4, device_pack=True)
    rec = codec.decode(enc)
    assert rec.shape == (64, 64, 3)
    assert np.isfinite(rec).all()


def test_mode_from_ratios_matches_router():
    from control_gic_tpu.ops.router import triple_grain_router
    e16 = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 4, 4)))
    e8 = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 8, 8)))
    for rc, rm in [(0.1, 0.4), (0.0, 0.8), (0.3, 0.0), (0.5, 0.5),
                   (1.0, 0.0), (0.0, 1.0), (0.0, 0.0), (0.3, 0.7)]:
        out = triple_grain_router(e16, e8, rc, rm)
        assert out.mode == mode_from_ratios(rc, rm), (rc, rm)
