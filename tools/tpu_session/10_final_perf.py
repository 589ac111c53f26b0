# Validation of the gated chain defaults: rt256 unchanged, 768 programs
# faster, kodak/tiled end-to-end numbers.
import os

from control_gic_tpu.models.cgic import CGIC as _CGIC


@jax.jit
def rt_scan(v, xs):
    def body(acc, x):
        rec, enc = model.apply(v, x, 0.1, 0.4)
        return acc + jnp.sum(rec.astype(jnp.float32)), None
    acc, _ = jax.lax.scan(body, jnp.zeros(()), xs)
    return acc


iters, batch = 10, 8
xs_w = jnp.asarray(rng.uniform(0, 1, (iters, batch, 256, 256, 3)),
                   jnp.float32)
t0 = time.perf_counter()
float(rt_scan(variables, xs_w))
print("rt256 warm", round(time.perf_counter() - t0, 1), "s")
for rep in range(2):
    xs = jnp.asarray(rng.uniform(0, 1, (iters, batch, 256, 256, 3)),
                     jnp.float32)
    t0 = time.perf_counter()
    float(rt_scan(variables, xs))
    print("rt256 (gated default) img/s",
          round(batch * iters / (time.perf_counter() - t0), 1))

# ---- 768 tile programs: encode A/B (encoder chain), decode default
from control_gic_tpu.parallel.tiling import (_decode_stitch_fn,
                                             _encode_tiles_fn, tile_grid)

th, tw = 1536, 2304
tiles = tile_grid(th, tw, 768)
offs = tuple((y, x) for y, x, _, _ in tiles)

from control_gic_tpu.codec import CGICCodec as _CC
os.environ["CONTROL_GIC_CHAIN"] = "0"
codec_p = _CC(model, variables, counts)
os.environ.pop("CONTROL_GIC_CHAIN")
imgs_dev = [jnp.asarray((rng.uniform(0, 1, (th, tw, 3)) * 255)
                        .astype(np.uint8)) for _ in range(4)]
for name, cdc, env in (("plain", codec_p, "0"), ("gated", codec, None)):
    if env is None:
        os.environ.pop("CONTROL_GIC_CHAIN", None)
    else:
        os.environ["CONTROL_GIC_CHAIN"] = env
    fn = _encode_tiles_fn(cdc, 0.1, 0.4, offs, 768, 768)
    b0 = fn(cdc.variables, imgs_dev[0])
    b0.block_until_ready()
    t0 = time.perf_counter()
    bufs = [fn(cdc.variables, im) for im in imgs_dev]
    for b in bufs:
        b.block_until_ready()
    print(name, "encode 6-tile compute ms/img",
          round((time.perf_counter() - t0) / 4 * 1e3, 1))
os.environ.pop("CONTROL_GIC_CHAIN", None)

# decode+stitch with gated default
from control_gic_tpu.coding.stream_pack import fused_to_bytes
from control_gic_tpu.codec import EncodedImage

layout = codec._pack_layout(0, 192, 192)
buf_h = np.asarray(bufs[0])
encs = [EncodedImage(mode=0, latent_hw=(192, 192), image_hw=(768, 768),
                     streams=fused_to_bytes(buf_h, layout, j))
        for j in range(6)]
inds = [codec._rebuild(e)[0] for e in encs]
dec_in = jnp.asarray(codec._compact_decode_input(encs, inds))
dec_in.block_until_ready()
fn = _decode_stitch_fn(codec, 0, offs, 768, 768, True)
canvas = jnp.zeros((th, tw, 3), jnp.uint8)
canvas = fn(codec.variables, canvas, dec_in)
canvas.block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    canvas = fn(codec.variables, canvas, dec_in)
canvas.block_until_ready()
print("gated decode+stitch compute ms/img",
      round((time.perf_counter() - t0) / 3 * 1e3, 1))

# ---- full pipelines with gated defaults
imgs = [a[0] for a in u8((1, th, tw, 3), 8)]
t0 = time.perf_counter()
compress_tiled_device(codec, imgs, 0.1, 0.4, device_unpack=False)
dt = time.perf_counter() - t0
print("tiled2k (gated, hostrx, n=8) img/s", round(8 / dt, 3),
      pstats(codec.last_pipeline_stats, 8))

kb, nk = 8, 6
iw = u8((kb, 512, 768, 3), 1)
t0 = time.perf_counter()
codec.roundtrip_pipelined(iw, 0.1, 0.4, device_pack=True, out_uint8=True)
print("kodak warm", round(time.perf_counter() - t0, 1), "s")
imgs = u8((kb, 512, 768, 3), nk)
t0 = time.perf_counter()
codec.roundtrip_pipelined(imgs, 0.1, 0.4, device_pack=True, out_uint8=True)
dt = time.perf_counter() - t0
print("kodak_full (gated, b8) img/s", round(kb * nk / dt, 2),
      pstats(codec.last_pipeline_stats, nk))

kb16 = 16
iw = u8((kb16, 512, 768, 3), 1)
t0 = time.perf_counter()
codec.roundtrip_pipelined(iw, 0.1, 0.4, device_pack=True, out_uint8=True)
print("kodak b16 warm", round(time.perf_counter() - t0, 1), "s")
imgs = u8((kb16, 512, 768, 3), 4)
t0 = time.perf_counter()
codec.roundtrip_pipelined(imgs, 0.1, 0.4, device_pack=True, out_uint8=True)
dt = time.perf_counter() - t0
print("kodak_full (gated, b16) img/s", round(kb16 * 4 / dt, 2),
      pstats(codec.last_pipeline_stats, 4))
