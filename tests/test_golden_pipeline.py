"""Full-pipeline golden test: the reference CGIC.compress() end-to-end vs
our codec with shared (ported) weights.

Per-component parity (encoder/decoder/router/Huffman) lives in test_parity /
test_coding; this test runs the reference's OWN compress() round-trip
(model.py:206-401) on CPU — the hardcoded .cuda() calls (quantize.py:28)
are monkeypatched to identity, and pytorch_lightning is stubbed with
nn.Module — and asserts against our CGICCodec.compress():

  - byte-identical stream files (indices_*.bin / mask_*.bin) per mode,
  - identical bpp (same filesize accounting, model.py:233),
  - allclose reconstructions,

for ratio triples covering all 7 compression modes. This pins the GLUE —
stream order, per-grain index splits (model.py:219-221), mode dispatch
(model.py:225-260), mask-complement reconstruction and bpp accounting —
not just the per-component math.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

CH = 32
CH_MULT = (1, 2, 2, 4, 4)
RES = 64
ZC = 4
N_EMBED = 64
EMBED_DIM = 4

# (coarse_ratio, medium_ratio) -> expected reference mode
MODE_RATIOS = [
    (0.1, 0.4, 0),   # all three grains
    (0.0, 0.4, 1),   # no coarse
    (0.1, 0.0, 2),   # no medium
    (0.3, 0.7, 3),   # no fine
    (1.0, 0.0, 4),   # all coarse
    (0.0, 1.0, 5),   # all medium
    (0.0, 0.0, 6),   # all fine
]


@pytest.fixture(scope="module")
def ref_model_and_codec():
    import torch

    # defeat the hardcoded .cuda() calls (quantize.py:28, inference.py:135)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # model.py imports pytorch_lightning only for the LightningModule base;
    # draw.py imports torchvision only for partition-map rendering (unused
    # with save_img=False). Neither is installed here — stub both.
    import types
    if "pytorch_lightning" not in sys.modules:
        pl_stub = types.ModuleType("pytorch_lightning")
        pl_stub.LightningModule = torch.nn.Module
        sys.modules["pytorch_lightning"] = pl_stub
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")
        tf.Compose = lambda ts: (lambda x: x)
        tf.ToPILImage = lambda *a, **k: (lambda x: x)
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
    sys.path.insert(0, REF)
    from CGIC.models.model import CGIC as RefCGIC
    from CGIC.tools.indices_coding import HuffmanCoding as RefHuffman
    from CGIC.tools.mask_coding import BinaryCoding as RefBinary

    dd = dict(double_z=False, z_channels=ZC, resolution=RES, in_channels=3,
              out_ch=3, ch=CH, ch_mult=list(CH_MULT), num_res_blocks=2,
              attn_resolutions=[8], dropout=0.0, update_router=False,
              router_config={
                  "target":
                      "CGIC.modules.vqvae.RouterTriple."
                      "TripleGrainFixedEntropyRouter",
                  "params": {"coarse_grain_ratio": 0.1,
                             "medium_grain_ratio": 0.4}})
    torch.manual_seed(7)
    tmodel = RefCGIC(ddconfig=dd, n_embed=N_EMBED, embed_dim=EMBED_DIM,
                     lossconfig=None).eval()

    # deterministic counter table (the Huffman table source,
    # inference.py:137-139)
    counts = np.random.default_rng(3).integers(
        1, 1000, N_EMBED).astype(np.int64)
    with torch.no_grad():
        for i in range(N_EMBED):
            tmodel.quantize.embedding_counter[str(i)].copy_(
                torch.tensor([float(counts[i])]))
    h_string = RefHuffman(tmodel.quantize.embedding_counter)
    h_mask = RefBinary()

    # port the torch weights into our model
    import jax
    from control_gic_tpu.codec import CGICCodec
    from control_gic_tpu.models import CGIC, CGICConfig
    from control_gic_tpu.utils.port_torch import port_cgic_state_dict

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, ported_counts = port_cgic_state_dict(sd)
    np.testing.assert_array_equal(ported_counts, counts)

    cfg = CGICConfig(n_embed=N_EMBED, embed_dim=EMBED_DIM, z_channels=ZC,
                     ch=CH, ch_mult=CH_MULT, num_res_blocks=2,
                     attn_resolutions=(8,), resolution=RES)
    ours = CGICCodec(CGIC(cfg), {"params": params}, counts)
    assert ours.huffman.codes == h_string.codes  # identical Huffman tables

    return tmodel, h_string, h_mask, ours


@pytest.mark.parametrize("rc,rm,want_mode", MODE_RATIOS)
def test_golden_compress_vs_reference(ref_model_and_codec, rc, rm,
                                      want_mode, tmp_path):
    import torch

    tmodel, h_string, h_mask, ours = ref_model_and_codec
    img = np.random.default_rng(11).uniform(
        0, 1, (RES, RES, 3)).astype(np.float32)   # eval [0,1] convention

    # reference compress() round-trip through real files
    tmodel.encoder.router_config["params"] = {
        "coarse_grain_ratio": rc, "medium_grain_ratio": rm}
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    with torch.no_grad():
        dec, ref_bpp, _ = tmodel.compress(
            torch.from_numpy(img.transpose(2, 0, 1))[None],
            str(ref_dir), h_string, h_mask, save_img=False)
    ref_files = sorted(os.listdir(ref_dir))

    # our compress() through files in a fresh dir
    our_dir = tmp_path / "ours"
    our_dir.mkdir()
    rec, bpp, enc = ours.compress(img, rc, rm, out_dir=str(our_dir))

    assert enc.mode == want_mode
    assert sorted(os.listdir(our_dir)) == ref_files
    for name in ref_files:
        with open(ref_dir / name, "rb") as f:
            want = f.read()
        with open(our_dir / name, "rb") as f:
            got = f.read()
        assert got == want, f"stream {name} differs in mode {want_mode}"
    assert bpp == pytest.approx(ref_bpp, abs=1e-12)

    want_img = dec[0].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(np.asarray(rec), want_img,
                               atol=2e-4, rtol=2e-3)
