# Decompose the tiled2k device timeline: wire probe + per-program compute.
import bench as _bench
print(_bench.wire_probe(jax))

from control_gic_tpu.parallel.tiling import (_decode_stitch_fn,
                                             _decode_stitch_unpack_fn,
                                             _encode_tiles_fn, tile_grid)
from control_gic_tpu.coding.stream_pack import fused_to_bytes
from control_gic_tpu.codec import EncodedImage

th, tw = 1536, 2304
tiles = tile_grid(th, tw, 768)
offs = tuple((y, x) for y, x, _, _ in tiles)
enc_fn = _encode_tiles_fn(codec, 0.1, 0.4, offs, 768, 768)

# device-resident inputs, distinct per rep (axon dedupes identical execs)
imgs_dev = [jnp.asarray((rng.uniform(0, 1, (th, tw, 3)) * 255)
                        .astype(np.uint8)) for _ in range(4)]
for im in imgs_dev:
    im.block_until_ready()

# encode compute only
bufs = [enc_fn(codec.variables, im) for im in imgs_dev[:1]]  # warm (cached)
bufs[0].block_until_ready()
t0 = time.perf_counter()
bufs = [enc_fn(codec.variables, im) for im in imgs_dev]
for b in bufs:
    b.block_until_ready()
print("encode 6-tile compute ms/img",
      round((time.perf_counter() - t0) / 4 * 1e3, 1))

# host receiver rebuild once; decode+stitch compute (host path)
mode = 0
layout = codec._pack_layout(mode, 192, 192)
buf_h = np.asarray(bufs[0])
encs = [EncodedImage(mode=mode, latent_hw=(192, 192), image_hw=(768, 768),
                     streams=fused_to_bytes(buf_h, layout, j))
        for j in range(6)]
t0 = time.perf_counter()
inds = [codec._rebuild(e)[0] for e in encs]
dec_in = codec._compact_decode_input(encs, inds)
print("host rebuild ms", round((time.perf_counter() - t0) * 1e3, 1),
      "dec_in KB", dec_in.nbytes >> 10)
dec_fn = _decode_stitch_fn(codec, mode, offs, 768, 768, True)
dec_in_dev = jnp.asarray(dec_in)
dec_in_dev.block_until_ready()
canvas = jnp.zeros((th, tw, 3), jnp.uint8)
canvas = dec_fn(codec.variables, canvas, dec_in_dev)   # warm (cached)
canvas.block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    # distinct input each rep: canvas output feeds back as the donated arg
    canvas = dec_fn(codec.variables, canvas, dec_in_dev)
canvas.block_until_ready()
print("decode+stitch (host rx) compute ms/img",
      round((time.perf_counter() - t0) / 3 * 1e3, 1))

# devrx decode+stitch compute
flat, offtbl = codec._flat_stream_upload(encs)
lut_s, lut_l = codec._decode_luts_on_device()
decu_fn = _decode_stitch_unpack_fn(codec, mode, offs, 768, 768, True)
flat_dev = jnp.asarray(flat)
offtbl_dev = jnp.asarray(offtbl)
canvas2 = jnp.zeros((th, tw, 3), jnp.uint8)
canvas2 = decu_fn(codec.variables, canvas2, flat_dev, offtbl_dev,
                  lut_s, lut_l)
canvas2.block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    canvas2 = decu_fn(codec.variables, canvas2, flat_dev, offtbl_dev,
                      lut_s, lut_l)
canvas2.block_until_ready()
print("decode+stitch (dev rx) compute ms/img",
      round((time.perf_counter() - t0) / 3 * 1e3, 1))

# raw H2D of one 2K image / D2H of one canvas, measured alone
img_h = (rng.uniform(0, 1, (th, tw, 3)) * 255).astype(np.uint8)
t0 = time.perf_counter()
d = jax.device_put(img_h)
d.block_until_ready()
print("H2D 2K image ms", round((time.perf_counter() - t0) * 1e3, 1))
t0 = time.perf_counter()
np.asarray(canvas)
print("D2H canvas ms", round((time.perf_counter() - t0) * 1e3, 1))
