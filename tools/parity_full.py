"""Full-width torch-reference forward parity at the flagship config.

tests/test_parity.py pins weight-port parity at ch=32 / 64px (fast CI size);
this tool runs the SAME check once at the real 130M-param width (ch=128,
256px, attn at 32): instantiate the reference torch Encoder/Decoder/
VectorQuantize2 (vqvae_blocks.py:195-374, decoder.py:215-398,
quantize.py:9-97) with seeded random weights, port them through
utils/port_torch, and compare:
  - encoder fused latent (max abs err)
  - router masks (exact equality)
  - quant_conv output + VQ index grid (agreement fraction; float argmin
    near-ties are the only legitimate divergence source)
  - decoder output (max abs err)

Runs on CPU (torch has no GPU here; the reference quantizer's hardcoded
.cuda() at quantize.py:28 is shimmed to a no-op for instantiation).

python tools/parity_full.py      (env: PF_CH=128 PF_RES=256)
Results are recorded in docs/STATUS.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import numpy as np

CH = int(os.environ.get("PF_CH", "128"))
RES = int(os.environ.get("PF_RES", "256"))
ZC = 4
N_EMBED = 1024
CH_MULT = (1, 2, 2, 4, 4)
ATTN = RES // 8  # attn at 1/8 resolution, like the reference's 32 @ 256


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")   # parity runs on CPU only
    from control_gic_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache("cpu")

    import torch
    torch.manual_seed(0)
    torch.nn.Module.cuda = lambda self, *a, **k: self  # CPU-only box shim

    from CGIC.modules.vqvae.decoder import Decoder as TorchDecoder
    from CGIC.modules.vqvae.quantize import VectorQuantize2
    from CGIC.modules.vqvae.vqvae_blocks import Encoder as TorchEncoder

    dd = dict(double_z=False, z_channels=ZC, resolution=RES, in_channels=3,
              out_ch=3, ch=CH, ch_mult=list(CH_MULT), num_res_blocks=2,
              attn_resolutions=[ATTN], dropout=0.0, update_router=False,
              router_config={
                  "target": "CGIC.modules.vqvae.RouterTriple."
                            "TripleGrainFixedEntropyRouter",
                  "params": {"coarse_grain_ratio": 0.1,
                             "medium_grain_ratio": 0.4}})
    t0 = time.time()
    tenc = TorchEncoder(**dd).eval()
    tdec = TorchDecoder(zq_ch=ZC, **dd).eval()
    tvq = VectorQuantize2(N_EMBED, ZC, beta=0.25).eval()
    tqconv = torch.nn.Conv2d(ZC, ZC, 1)
    tpqconv = torch.nn.Conv2d(ZC, ZC, 1)
    n_enc = sum(p.numel() for p in tenc.parameters())
    n_dec = sum(p.numel() for p in tdec.parameters())
    print(f"torch modules built in {time.time()-t0:.1f}s: "
          f"encoder {n_enc:,} decoder {n_dec:,} params")

    # ---- port weights
    import jax
    import jax.numpy as jnp
    from control_gic_tpu.models.cgic import CGIC, CGICConfig
    from control_gic_tpu.ops import patch_entropy, triple_grain_router
    from control_gic_tpu.utils.port_torch import port_cgic_state_dict

    sd = {f"encoder.{k}": v.detach().numpy()
          for k, v in tenc.state_dict().items()}
    sd.update({f"decoder.{k}": v.detach().numpy()
               for k, v in tdec.state_dict().items()})
    sd.update({f"quantize.{k}": v.detach().numpy()
               for k, v in tvq.state_dict().items()})
    sd.update({f"quant_conv.{k}": v.detach().numpy()
               for k, v in tqconv.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v.detach().numpy()
               for k, v in tpqconv.state_dict().items()})
    params, _ = port_cgic_state_dict(sd)

    cfg = CGICConfig(ch=CH, ch_mult=CH_MULT, resolution=RES,
                     attn_resolutions=(ATTN,), n_embed=N_EMBED)
    model = CGIC(cfg)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, RES, RES, 3)).astype(np.float32)

    # ---- torch full encode path (entropy maps from our op: f32 oracle-
    # pinned in test_ops; the torch Entropy module lives in model.py which
    # pulls in the loss stack, unavailable without network egress)
    e8 = np.asarray(patch_entropy(jnp.asarray(x), 8))
    e16 = np.asarray(patch_entropy(jnp.asarray(x), 16))
    with torch.no_grad():
        tout = tenc(torch.tensor(x.transpose(0, 3, 1, 2)),
                    torch.tensor(e16), torch.tensor(e8))
        t_h = tout["h"]
        t_masks = [m.numpy() for m in tout["mask"]]
        t_hq = tqconv(t_h)
        _, _, t_ind = tvq(t_hq)
        t_ind = t_ind.numpy().reshape(RES // 4, RES // 4)
        t_zq = tvq.embedding(torch.tensor(t_ind.reshape(1, -1)))
        t_zq = t_zq.view(1, RES // 4, RES // 4, ZC).permute(0, 3, 1, 2)
        t_rec = tdec(tpqconv(t_zq), t_zq,
                     [torch.tensor(m) for m in t_masks]).numpy()
    print(f"torch forward done {time.time()-t0:.1f}s")

    # ---- ours: full jitted encode/decode through CGIC
    variables = {"params": params}
    t1 = time.time()
    enc = jax.jit(lambda v, xx: model.apply(v, xx, 0.1, 0.4,
                                            method=CGIC.encode))(
        variables, jnp.asarray(x))
    j_masks = [np.asarray(enc.router.mask_coarse),
               np.asarray(enc.router.mask_medium),
               np.asarray(enc.router.mask_fine)]
    rec = jax.jit(lambda v, q, m: model.apply(v, q, m,
                                              method=CGIC.decode))(
        variables, enc.quant, enc.router.masks)
    print(f"jax forward (incl compile) {time.time()-t1:.1f}s")

    # ---- compare
    mask_eq = all(np.array_equal(j, t[:, 0])
                  for j, t in zip(j_masks, t_masks))
    ind_agree = float(np.mean(np.asarray(enc.indices)[0] == t_ind))
    t_h_np = t_h.numpy().transpose(0, 2, 3, 1)

    # rebuild our fused latent for the encoder-level comparison
    from control_gic_tpu.ops import upsample_nearest
    z_f, z_m, z_c = model.bind(variables).encoder(jnp.asarray(x))
    m_c, m_m, m_f = (jnp.asarray(m).astype(jnp.float32)[..., None]
                     for m in j_masks)
    j_h = (upsample_nearest(z_c, 4) * upsample_nearest(m_c, 4)
           + upsample_nearest(z_m, 2) * upsample_nearest(m_m, 2)
           + z_f * m_f)
    enc_err = float(np.max(np.abs(np.asarray(j_h) - t_h_np)))
    dec_err = float(np.max(np.abs(np.asarray(rec)
                                  - t_rec.transpose(0, 2, 3, 1))))

    # tie-bound the index disagreements (VERDICT r3 item 6): at every
    # position where the two implementations pick different codes, show
    # the two codes are an argmin NEAR-TIE — the squared-distance gap is
    # at float-rounding scale relative to the operand magnitude — so the
    # 0.0x% disagreement is provably numerical tie-breaking, not a bug.
    j_ind = np.asarray(enc.indices)[0]
    dis = np.argwhere(j_ind != t_ind)
    tie_rel_max = 0.0
    if dis.size:
        z = t_hq.detach().numpy().transpose(0, 2, 3, 1)[0]   # [Hl, Wl, 4]
        emb = tvq.embedding.weight.detach().numpy()          # [N, 4]
        zs = z[dis[:, 0], dis[:, 1]]
        d_t = ((zs - emb[t_ind[dis[:, 0], dis[:, 1]]]) ** 2).sum(-1)
        d_j = ((zs - emb[j_ind[dis[:, 0], dis[:, 1]]]) ** 2).sum(-1)
        denom = (zs ** 2).sum(-1) + (emb ** 2).sum(-1).max()
        tie_rel = np.abs(d_t - d_j) / denom
        tie_rel_max = float(tie_rel.max())
        print(f"index disagreements: {len(dis)}/{j_ind.size} "
              f"({len(dis) / j_ind.size:.4%}); max distance gap "
              f"|d_ref - d_jax| / scale = {tie_rel_max:.2e} "
              f"-> all are float argmin near-ties" if tie_rel_max < 1e-5
              else f"index disagreements NOT tie-bounded: {tie_rel_max:.2e}")

    print(f"router masks exactly equal: {mask_eq}")
    print(f"encoder fused-latent max abs err: {enc_err:.3e}")
    print(f"VQ index grid agreement: {ind_agree*100:.3f}%")
    print(f"decoder output max abs err: {dec_err:.3e}")
    ok = (mask_eq and enc_err < 5e-4 and ind_agree > 0.999
          and dec_err < 5e-4 and tie_rel_max < 1e-5)
    print("FULL-WIDTH PARITY:", "OK" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
