"""Golden forward-parity tests against the reference PyTorch modules.

Instantiates the reference Encoder/Decoder (from the read-only mount) at a
small config, ports the torch weights into our flax modules via
utils/port_torch, and checks the forward outputs agree to float tolerance.
This validates both the weight-port mapping and the layer math (convs,
GroupNorm/SpatialNorm, attention, resampling, mask fusion) in one shot.
"""
import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

# note: the reference encoder hardcodes its fine head width as block_in//2
# (vqvae_blocks.py:241), so ch_mult must satisfy 2*mult[-3] == mult[-1];
# use the real ratio structure at reduced width.
CH = 32
CH_MULT = (1, 2, 2, 4, 4)
RES = 64
ZC = 4


def _torch_modules():
    import sys
    sys.path.insert(0, REF)
    import torch
    from CGIC.modules.vqvae.vqvae_blocks import Encoder as TorchEncoder
    from CGIC.modules.vqvae.decoder import Decoder as TorchDecoder

    dd = dict(double_z=False, z_channels=ZC, resolution=RES, in_channels=3,
              out_ch=3, ch=CH, ch_mult=list(CH_MULT), num_res_blocks=2,
              attn_resolutions=[8], dropout=0.0, update_router=False,
              router_config={
                  "target":
                      "CGIC.modules.vqvae.RouterTriple."
                      "TripleGrainFixedEntropyRouter",
                  "params": {"coarse_grain_ratio": 0.1,
                             "medium_grain_ratio": 0.4}})
    torch.manual_seed(0)
    enc = TorchEncoder(**dd).eval()
    dec = TorchDecoder(zq_ch=ZC, **dd).eval()
    return torch, enc, dec


@pytest.fixture(scope="module")
def torch_and_ported():
    import jax
    import jax.numpy as jnp
    from control_gic_tpu.models.encoder import Encoder
    from control_gic_tpu.models.decoder import Decoder
    from control_gic_tpu.utils.port_torch import port_cgic_state_dict

    torch, tenc, tdec = _torch_modules()
    sd = {f"encoder.{k}": v.detach().numpy()
          for k, v in tenc.state_dict().items()}
    sd.update({f"decoder.{k}": v.detach().numpy()
               for k, v in tdec.state_dict().items()})
    params, _ = port_cgic_state_dict(sd)

    jenc = Encoder(ch=CH, ch_mult=CH_MULT, num_res_blocks=2,
                   attn_resolutions=(8,), resolution=RES, z_channels=ZC)
    jdec = Decoder(ch=CH, out_ch=3, ch_mult=CH_MULT, num_res_blocks=2,
                   attn_resolutions=(8,), resolution=RES)

    # sanity: ported trees have exactly the structure flax expects
    x = jnp.zeros((1, RES, RES, 3))
    ref_enc = jax.eval_shape(lambda k, xx: jenc.init(k, xx),
                             jax.random.PRNGKey(0), x)["params"]
    flat_ref = jax.tree_util.tree_structure(ref_enc)
    flat_got = jax.tree_util.tree_structure(params["encoder"])
    assert flat_ref == flat_got, "encoder param tree mismatch"

    return torch, tenc, tdec, jenc, jdec, params


def test_encoder_forward_parity(torch_and_ported, rng):
    import jax.numpy as jnp
    from control_gic_tpu.ops import patch_entropy, triple_grain_router, \
        upsample_nearest

    torch, tenc, tdec, jenc, jdec, params = torch_and_ported
    x = rng.uniform(-1, 1, (1, RES, RES, 3)).astype(np.float32)

    e8 = patch_entropy(jnp.asarray(x), 8)
    e16 = patch_entropy(jnp.asarray(x), 16)

    with torch.no_grad():
        tout = tenc(torch.tensor(x.transpose(0, 3, 1, 2)),
                    torch.tensor(np.asarray(e16)),
                    torch.tensor(np.asarray(e8)))
    t_h = tout["h"].numpy().transpose(0, 2, 3, 1)          # NCHW -> NHWC
    t_masks = [m.numpy() for m in tout["mask"]]

    z_f, z_m, z_c = jenc.apply({"params": params["encoder"]},
                               jnp.asarray(x))
    # fuse with the torch router's masks to isolate network parity
    m_c = jnp.asarray(t_masks[0][:, 0]).astype(jnp.float32)[..., None]
    m_m = jnp.asarray(t_masks[1][:, 0]).astype(jnp.float32)[..., None]
    m_f = jnp.asarray(t_masks[2][:, 0]).astype(jnp.float32)[..., None]
    j_h = (upsample_nearest(z_c, 4) * upsample_nearest(m_c, 4)
           + upsample_nearest(z_m, 2) * upsample_nearest(m_m, 2)
           + z_f * m_f)

    np.testing.assert_allclose(np.asarray(j_h), t_h, atol=2e-4, rtol=2e-3)

    # and our router agrees with the torch router on these entropy maps
    ours = triple_grain_router(e16, e8, 0.1, 0.4)
    np.testing.assert_array_equal(np.asarray(ours.mask_coarse),
                                  t_masks[0][:, 0])
    np.testing.assert_array_equal(np.asarray(ours.mask_medium),
                                  t_masks[1][:, 0])
    np.testing.assert_array_equal(np.asarray(ours.mask_fine),
                                  t_masks[2][:, 0])


def test_decoder_forward_parity(torch_and_ported, rng):
    import jax.numpy as jnp

    torch, tenc, tdec, jenc, jdec, params = torch_and_ported
    hl = RES // 4
    z = rng.normal(size=(1, hl, hl, ZC)).astype(np.float32) * 0.5
    zq = rng.normal(size=(1, hl, hl, ZC)).astype(np.float32) * 0.5
    m_c = (rng.random((1, hl // 4, hl // 4)) < 0.3).astype(np.int32)
    m_m = ((rng.random((1, hl // 2, hl // 2)) < 0.5).astype(np.int32)
           * (1 - m_c.repeat(2, 1).repeat(2, 2)))
    m_f = 1 - m_c.repeat(4, 1).repeat(4, 2) - m_m.repeat(2, 1).repeat(2, 2)

    with torch.no_grad():
        t_out = tdec(torch.tensor(z.transpose(0, 3, 1, 2)),
                     torch.tensor(zq.transpose(0, 3, 1, 2)),
                     [torch.tensor(m_c[:, None]),
                      torch.tensor(m_m[:, None]),
                      torch.tensor(m_f[:, None])])
    t_img = t_out.numpy().transpose(0, 2, 3, 1)

    j_img = jdec.apply({"params": params["decoder"]}, jnp.asarray(z),
                       jnp.asarray(zq),
                       (jnp.asarray(m_c), jnp.asarray(m_m), jnp.asarray(m_f)))
    np.testing.assert_allclose(np.asarray(j_img), t_img, atol=2e-4, rtol=2e-3)
