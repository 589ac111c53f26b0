# Timeline trace of the tiled pipeline to find the serialization.
import os
os.environ["CONTROL_GIC_PIPE_TRACE"] = "1"
imgs = [a[0] for a in u8((1, th, tw, 3), 5)]
t0 = time.perf_counter()
compress_tiled_device(codec, imgs, 0.1, 0.4, device_unpack=False)
dt = time.perf_counter() - t0
print("5 imgs", round(dt, 2), "s ->", round(5 / dt, 3), "img/s")
print(pstats(codec.last_pipeline_stats, 5))
os.environ.pop("CONTROL_GIC_PIPE_TRACE")
