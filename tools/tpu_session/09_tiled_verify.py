# Compute-only A/B of the tiled decode+stitch programs (plain vs chain
# codecs already compiled in 08) + interleaved full-run A/B.
from control_gic_tpu.parallel.tiling import (_decode_stitch_fn, tile_grid)
from control_gic_tpu.coding.stream_pack import fused_to_bytes
from control_gic_tpu.codec import EncodedImage

th, tw = 1536, 2304
tiles = tile_grid(th, tw, 768)
offs = tuple((y, x) for y, x, _, _ in tiles)

# real-enc inputs
img = (rng.uniform(0, 1, (th, tw, 3)) * 255).astype(np.uint8)
encs_b = codec.encode_batch(
    np.stack([img[y:y + 768, x:x + 768] for y, x in offs]),
    0.1, 0.4, device_pack=True)
inds = [codec._rebuild(e)[0] for e in encs_b]
dec_in = jnp.asarray(codec._compact_decode_input(encs_b, inds))
dec_in.block_until_ready()

import os
for name, cdc, env in (("plain", codec, "0"), ("chain", codec_tc, "1")):
    os.environ["CONTROL_GIC_CHAIN"] = env
    fn = _decode_stitch_fn(cdc, 0, offs, 768, 768, True)
    canvas = jnp.zeros((th, tw, 3), jnp.uint8)
    canvas = fn(cdc.variables, canvas, dec_in)
    canvas.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        canvas = fn(cdc.variables, canvas, dec_in)
    canvas.block_until_ready()
    print(name, "tiled decode+stitch compute ms/img",
          round((time.perf_counter() - t0) / 3 * 1e3, 1))
os.environ["CONTROL_GIC_CHAIN"] = "0"

# interleaved full-pipeline A/B (2x each, alternating, same process)
for rep in range(2):
    for name, cdc, env in (("plain", codec, "0"), ("chain", codec_tc, "1")):
        os.environ["CONTROL_GIC_CHAIN"] = env
        imgs = [a[0] for a in u8((1, th, tw, 3), 6)]
        t0 = time.perf_counter()
        compress_tiled_device(cdc, imgs, 0.1, 0.4, device_unpack=False)
        dt = time.perf_counter() - t0
        print(f"rep{rep} {name} tiled2k img/s", round(6 / dt, 3))
os.environ["CONTROL_GIC_CHAIN"] = "0"
