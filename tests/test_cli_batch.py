"""The infer CLI's batched round-trip helper must reproduce the per-image
compress() results exactly (streams, bpp, reconstruction)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from control_gic_tpu.cli.infer import _compress_batched
from control_gic_tpu.codec import CGICCodec
from control_gic_tpu.models import CGIC, CGICConfig

TINY = CGICConfig(n_embed=32, embed_dim=4, z_channels=4, ch=32,
                  ch_mult=(1, 1, 2, 2, 2), num_res_blocks=1,
                  attn_resolutions=(8,), resolution=64)


class _ListDataset:
    def __init__(self, items):
        self._items = items

    def __len__(self):
        return len(self._items)

    def __getitem__(self, i):
        return self._items[i]


@pytest.mark.parametrize("device_pack", [False, True])
def test_compress_batched_matches_per_image(rng, tmp_path, device_pack):
    model = CGIC(TINY)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), 0.1, 0.4)
    codec = CGICCodec(model, variables, np.ones(TINY.n_embed, np.int64))
    imgs = [rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
            for _ in range(3)]
    ds = _ListDataset(imgs)

    results = _compress_batched(codec, ds, 0.1, 0.4, batch=2,
                                stream_dir=str(tmp_path),
                                device_pack=device_pack)
    assert set(results) == {0, 1, 2}
    for k, img in enumerate(imgs):
        rec, bpp, enc, dt = results[k]
        rec_solo, bpp_solo, enc_solo = codec.compress(img, 0.1, 0.4)
        assert enc.streams == enc_solo.streams
        assert bpp == pytest.approx(bpp_solo)
        np.testing.assert_allclose(rec, rec_solo, atol=1e-5, rtol=1e-5)


def test_infer_highres_pipeline_cli(rng, tmp_path, monkeypatch):
    """The high-res CLI's wire-minimal pipeline path (default) produces
    the same bpp per image as the plain per-tile path (--no-pipeline);
    recon differs only by the save_png uint8 quantization."""
    from PIL import Image

    from control_gic_tpu.cli import infer_highres

    model = CGIC(TINY)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), 0.1, 0.4)
    codec = CGICCodec(model, variables, np.ones(TINY.n_embed, np.int64))
    monkeypatch.setattr(infer_highres, "build_codec", lambda ckpt: codec)
    monkeypatch.setattr(infer_highres, "enable_compilation_cache",
                        lambda: None)

    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    for i, hw in enumerate([(96, 128), (80, 80)]):
        arr = (rng.uniform(0, 255, hw + (3,))).astype(np.uint8)
        Image.fromarray(arr).save(str(imgdir / f"{i}.png"))

    out_p = tmp_path / "out_pipe"
    infer_highres.main(["-i", str(imgdir), "-o", str(out_p),
                        "--tile", "64"])
    out_n = tmp_path / "out_plain"
    infer_highres.main(["-i", str(imgdir), "-o", str(out_n),
                        "--tile", "64", "--no-pipeline"])

    def bpps(d):
        lines = (d / "bpp.txt").read_text().splitlines()
        return [float(l.split("bpp=")[1].split()[0])
                for l in lines if l[0].isdigit()]

    assert bpps(out_p) == bpps(out_n)
    pipe_pngs = sorted(p.name for p in out_p.glob("*.png"))
    plain_pngs = sorted(p.name for p in out_n.glob("*.png"))
    assert pipe_pngs == plain_pngs
    for name in pipe_pngs:
        a = np.asarray(Image.open(out_p / name), np.int16)
        b = np.asarray(Image.open(out_n / name), np.int16)
        diff = np.abs(a - b)
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3
