# tiled2k with the chained decoder (host receiver), vs plain host receiver.
import os

th, tw = 1536, 2304
os.environ["CONTROL_GIC_CHAIN"] = "0"
w = [a[0] for a in u8((1, th, tw, 3), 1)]
t0 = time.perf_counter()
compress_tiled_device(codec, w, 0.1, 0.4, device_unpack=False)
print("tiled plain warm", round(time.perf_counter() - t0, 1), "s")
imgs = [a[0] for a in u8((1, th, tw, 3), 8)]
t0 = time.perf_counter()
compress_tiled_device(codec, imgs, 0.1, 0.4, device_unpack=False)
dt = time.perf_counter() - t0
print("tiled2k plain img/s", round(8 / dt, 3),
      pstats(codec.last_pipeline_stats, 8))

os.environ["CONTROL_GIC_CHAIN"] = "1"
from control_gic_tpu.codec import CGICCodec as _CC
codec_tc = _CC(model, variables, counts)
codec_tc._encode_pack_fns = codec._encode_pack_fns
# share the compiled tiled ENCODE programs (chain only affects decode)
codec_tc._tile_fns = {k: v for k, v in getattr(codec, "_tile_fns",
                                               {}).items()
                      if k[0] == "enc"}
w = [a[0] for a in u8((1, th, tw, 3), 1)]
t0 = time.perf_counter()
compress_tiled_device(codec_tc, w, 0.1, 0.4, device_unpack=False)
print("tiled chain warm", round(time.perf_counter() - t0, 1), "s")
imgs = [a[0] for a in u8((1, th, tw, 3), 8)]
t0 = time.perf_counter()
compress_tiled_device(codec_tc, imgs, 0.1, 0.4, device_unpack=False)
dt = time.perf_counter() - t0
print("tiled2k chain img/s", round(8 / dt, 3),
      pstats(codec_tc.last_pipeline_stats, 8))
os.environ["CONTROL_GIC_CHAIN"] = "0"
