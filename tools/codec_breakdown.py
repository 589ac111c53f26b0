"""Full-codec (entropy stage included) wall-time breakdown on the chip.

bench.py's codec256_full_img_s includes, per batch: the device-packed
neural encode, D2H of packed words, host byte framing, host receiver
rebuild (Huffman/bitmap decode + grid scatter), H2D of index grids, the
neural decode, and D2H of the reconstruction. This tool times each leg
separately, plus raw tunnel H2D/D2H bandwidth, so the gap between
neural-only and full-codec throughput is attributable.

python tools/codec_breakdown.py   (env: CB_BATCH=8 CB_REPS=5)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(f"~/.cache/jax_cache_{jax.default_backend()}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from control_gic_tpu.codec import CGICCodec
    from control_gic_tpu.models import CGIC, CGICConfig

    B = int(os.environ.get("CB_BATCH", "8"))
    R = int(os.environ.get("CB_REPS", "5"))
    cfg = CGICConfig(dtype="bfloat16")
    model = CGIC(cfg)
    rng = np.random.default_rng(0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3)), 0.1, 0.4)
    counts = np.maximum(rng.poisson(100, cfg.n_embed), 1).astype(np.int64)
    codec = CGICCodec(model, variables, counts)

    # ---------------- raw tunnel bandwidth (distinct buffers, real fetch)
    bufs = [rng.uniform(0, 1, (B, 256, 256, 3)).astype(np.float32)
            for _ in range(R)]
    dev = [jax.device_put(bufs[0])]
    float(jnp.sum(dev[0]))  # init
    t0 = time.perf_counter()
    for b in bufs:
        d = jax.device_put(b)
        d.block_until_ready()
        dev.append(d)
    h2d = time.perf_counter() - t0
    mb = bufs[0].nbytes / 1e6
    t0 = time.perf_counter()
    for d in dev[1:]:
        np.asarray(d)
    d2h = time.perf_counter() - t0
    print(f"tunnel H2D: {mb * R / h2d:7.1f} MB/s   "
          f"D2H: {mb * R / d2h:7.1f} MB/s   ({mb:.1f} MB buffers)")

    # ---------------- per-leg timing of the full codec
    imgs = [rng.uniform(0, 1, (B, 256, 256, 3)).astype(np.float32)
            for _ in range(R)]
    pack_fn = codec._encode_pack_fn(0.1, 0.4, per_sample=True)
    # warmup both programs
    encs = codec.encode_batch(imgs[0], 0.1, 0.4, device_pack=True)
    codec.decode_batch(encs)

    t_pack = t_fetch = t_frame = t_rebuild = t_h2d = t_dec = 0.0
    from control_gic_tpu.ops.router import mode_from_ratios
    from control_gic_tpu.codec import EncodedImage
    from control_gic_tpu.coding.stream_pack import fused_to_bytes
    mode = mode_from_ratios(0.1, 0.4)
    layout = codec._pack_layout(mode, 64, 64)
    dec_fn = codec._decode_fused_fn(mode, 64, 64, False)
    for im in imgs:
        x = jnp.asarray(im)
        t0 = time.perf_counter()
        buf = pack_fn(codec.variables, x)
        jax.block_until_ready(buf)
        t_pack += time.perf_counter() - t0

        t0 = time.perf_counter()
        buf = np.asarray(buf)
        t_fetch += time.perf_counter() - t0

        t0 = time.perf_counter()
        encs = [EncodedImage(mode=mode, latent_hw=(64, 64),
                             image_hw=(256, 256),
                             streams=fused_to_bytes(buf, layout, i))
                for i in range(B)]
        t_frame += time.perf_counter() - t0

        t0 = time.perf_counter()
        inds = [codec._rebuild(e)[0] for e in encs]
        buf = codec._compact_decode_input(encs, inds)
        t_rebuild += time.perf_counter() - t0

        t0 = time.perf_counter()
        dbuf = jnp.asarray(buf)
        dbuf.block_until_ready()
        t_h2d += time.perf_counter() - t0

        t0 = time.perf_counter()
        rec = dec_fn(codec.variables, dbuf)
        rec = np.asarray(rec)
        t_dec += time.perf_counter() - t0

    tot = t_pack + t_fetch + t_frame + t_rebuild + t_h2d + t_dec
    n = B * R
    print(f"encode+pack (device, incl dispatch): {t_pack/R*1e3:8.1f} ms/batch")
    print(f"packed-words D2H fetch:              {t_fetch/R*1e3:8.1f} ms/batch")
    print(f"host byte framing:                   {t_frame/R*1e3:8.1f} ms/batch")
    print(f"host receiver rebuild:               {t_rebuild/R*1e3:8.1f} ms/batch")
    print(f"decode-input H2D (fused single put): {t_h2d/R*1e3:8.1f} ms/batch")
    print(f"decode + H2D/D2H:                    {t_dec/R*1e3:8.1f} ms/batch")
    print(f"TOTAL {tot/R*1e3:8.1f} ms/batch -> {n/tot:6.2f} img/s full codec")


if __name__ == "__main__":
    main()
