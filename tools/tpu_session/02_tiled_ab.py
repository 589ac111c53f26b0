# tiled2k receiver A/B: host-compact vs device-unpack receivers.
th, tw = 1536, 2304
for du in (False, True):
    w = [a[0] for a in u8((1, th, tw, 3), 1)]
    t0 = time.perf_counter()
    compress_tiled_device(codec, w, 0.1, 0.4, device_unpack=du)
    print("warm du=", du, round(time.perf_counter() - t0, 1), "s")

for du in (False, True):
    imgs = [a[0] for a in u8((1, th, tw, 3), 6)]
    t0 = time.perf_counter()
    compress_tiled_device(codec, imgs, 0.1, 0.4, device_unpack=du)
    dt = time.perf_counter() - t0
    print("tiled2k du=", du, "img/s", round(6 / dt, 3),
          pstats(codec.last_pipeline_stats, 6))
