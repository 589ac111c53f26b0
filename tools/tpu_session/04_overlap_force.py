# A) does H2D overlap device compute?  B) norm_conv-forced 768 decode A/B.
img_h2 = (rng.uniform(0, 1, (th, tw, 3)) * 255).astype(np.uint8)
img_h3 = (rng.uniform(0, 1, (th, tw, 3)) * 255).astype(np.uint8)

# dispatch a long decode (inputs device-resident), then upload 10.6 MB
canvas = dec_fn(codec.variables, canvas, dec_in_dev)
t0 = time.perf_counter()
canvas = dec_fn(codec.variables, canvas, dec_in_dev)
d2 = jax.device_put(img_h2)
d2.block_until_ready()
t_up = time.perf_counter() - t0
canvas.block_until_ready()
t_all = time.perf_counter() - t0
print("decode+concurrent H2D: upload done at", round(t_up * 1e3, 1),
      "ms, both done at", round(t_all * 1e3, 1),
      "ms (serial would be ~1075+900)")

# C) D2H overlap: dispatch decode, then fetch a resident 10.6 MB array
big_dev = jax.device_put(img_h3)
big_dev.block_until_ready()
canvas = dec_fn(codec.variables, canvas, dec_in_dev)
t0 = time.perf_counter()
canvas = dec_fn(codec.variables, canvas, dec_in_dev)
_ = np.asarray(big_dev)
t_down = time.perf_counter() - t0
canvas.block_until_ready()
t_all = time.perf_counter() - t0
print("decode+concurrent D2H: fetch done at", round(t_down * 1e3, 1),
      "ms, both done at", round(t_all * 1e3, 1), "ms")

# B) norm_conv forced variants of the 768 programs (fresh codec => fresh
# jit cache; trace happens inside the force context)
from control_gic_tpu.ops.norm_conv import force_norm_conv
from control_gic_tpu.codec import CGICCodec as _CC
from control_gic_tpu.parallel import tiling as _tiling

codec_f = _CC(model, variables, counts)
with force_norm_conv():
    dec_fn_f = _tiling._decode_stitch_fn(codec_f, 0, offs, 768, 768, True)
    t0 = time.perf_counter()
    canvas_f = dec_fn_f(codec_f.variables, jnp.zeros((th, tw, 3), jnp.uint8),
                        dec_in_dev)
    canvas_f.block_until_ready()
    print("force-traced decode warm", round(time.perf_counter() - t0, 1), "s")
    t0 = time.perf_counter()
    for _ in range(3):
        canvas_f = dec_fn_f(codec_f.variables, canvas_f, dec_in_dev)
    canvas_f.block_until_ready()
    print("decode+stitch (norm_conv forced) compute ms/img",
          round((time.perf_counter() - t0) / 3 * 1e3, 1))
# equality vs the unforced output
print("max abs diff vs plain:",
      int(np.abs(np.asarray(canvas_f).astype(np.int32)
                 - np.asarray(canvas).astype(np.int32)).max()))
