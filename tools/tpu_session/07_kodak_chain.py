# kodak_full (512x768, batch 8) chain A/B through the real pipelined codec.
import os

kb, nk = 8, 6
os.environ["CONTROL_GIC_CHAIN"] = "0"
imgs_w = u8((kb, 512, 768, 3), 1)
t0 = time.perf_counter()
codec.roundtrip_pipelined(imgs_w, 0.1, 0.4, device_pack=True,
                          out_uint8=True)
print("plain warm", round(time.perf_counter() - t0, 1), "s")
imgs = u8((kb, 512, 768, 3), nk)
t0 = time.perf_counter()
codec.roundtrip_pipelined(imgs, 0.1, 0.4, device_pack=True, out_uint8=True)
dt = time.perf_counter() - t0
print("kodak_full plain img/s", round(kb * nk / dt, 2),
      pstats(codec.last_pipeline_stats, nk))

os.environ["CONTROL_GIC_CHAIN"] = "1"
from control_gic_tpu.codec import CGICCodec as _CC
codec_c = _CC(model, variables, counts)
codec_c._encode_pack_fns = codec._encode_pack_fns   # share compiled encode
imgs_w = u8((kb, 512, 768, 3), 1)
t0 = time.perf_counter()
codec_c.roundtrip_pipelined(imgs_w, 0.1, 0.4, device_pack=True,
                            out_uint8=True)
print("chain warm", round(time.perf_counter() - t0, 1), "s")
imgs = u8((kb, 512, 768, 3), nk)
t0 = time.perf_counter()
codec_c.roundtrip_pipelined(imgs, 0.1, 0.4, device_pack=True,
                            out_uint8=True)
dt = time.perf_counter() - t0
print("kodak_full chain img/s", round(kb * nk / dt, 2),
      pstats(codec_c.last_pipeline_stats, nk))
os.environ["CONTROL_GIC_CHAIN"] = "0"
