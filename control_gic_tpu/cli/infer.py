"""Single-shot codec evaluation CLI (counterpart of reference inference.py).

Usage:
  python -m control_gic_tpu.cli.infer -i <images_dir> -o <out_dir> \
      [--ckpt model.ckpt|orbax_dir] [--ratios 0.1 0.4] \
      [--write-partition-map] [--images-range 0 -1]

Per image: center-crop to /16, compress through real bitstream files,
reconstruct, write `NNN_<bpp>.png`, log per-image and average bpp (and PSNR)
to bpp.txt — the same eval protocol as inference.py:127-175.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..data import EvalImageDataset
from ..utils.draw import draw_partition_map, draw_partition_map_color
from ..utils.metrics import psnr
from .common import build_codec, enable_compilation_cache, save_png


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--images_dir", type=str, required=True)
    p.add_argument("-o", "--output_dir", type=str, default="./output")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--use-ema", action="store_true",
                   help="use EMA shadow weights from a training checkpoint")
    p.add_argument("--ratios", type=float, nargs=2, default=(0.1, 0.4),
                   metavar=("COARSE", "MEDIUM"),
                   help="(coarse, medium) grain ratios; fine = 1 - c - m")
    p.add_argument("-w", "--write_partition_map", action="store_true")
    p.add_argument("--partition_map_style", choices=("lines", "color"),
                   default="lines",
                   help="'lines' draws grain-cell borders; 'color' blends a "
                        "granularity heat map (reference draw.py:42-76)")
    p.add_argument("--device_pack", action="store_true",
                   help="entropy-pack streams on device, fused with the "
                        "encoder (byte-identical output)")
    p.add_argument("--batch", type=int, default=1,
                   help="batch same-shape images through one device "
                        "program (per-sample routing keeps every stream "
                        "identical to a solo encode); partition maps force "
                        "the per-image path")
    p.add_argument("-r", "--images_range", type=int, nargs=2, default=(0, -1))
    p.add_argument("--lpips", action="store_true",
                   help="also report LPIPS (NOTE: needs ported backbone "
                        "weights for values comparable to published "
                        "numbers; random-init otherwise, see models/lpips)")
    p.add_argument("--lpips_net", choices=("alex", "vgg", "squeeze"),
                   default="alex",
                   help="LPIPS backbone variant (networks_basic.py:36-43)")
    return p


def _compress_batched(codec, dataset, rc, rm, batch, stream_dir,
                      device_pack):
    """Round-trip all images through batched device programs (same-shape
    groups, per-sample routing). Returns {index: (rec, bpp, enc, dt)};
    streams are identical to solo encodes (test_parallel pins this)."""
    from collections import defaultdict

    from ..codec import EncodedImage

    images = [dataset[k] for k in range(len(dataset))]
    groups = defaultdict(list)
    for k, img in enumerate(images):
        groups[img.shape].append(k)

    results = {}
    for shape, idxs in groups.items():
        for lo in range(0, len(idxs), batch):
            chunk = idxs[lo:lo + batch]
            t0 = time.time()
            encs = codec.encode_batch(
                np.stack([images[k] for k in chunk]), rc, rm,
                device_pack=device_pack)
            # honest file round-trip (same contract as compress())
            reread = []
            for enc in encs:
                enc.write(stream_dir)
                reread.append(EncodedImage.read(
                    stream_dir, enc.mode, enc.latent_hw, enc.image_hw))
            recs = codec.decode_batch(reread)
            dt = (time.time() - t0) / len(chunk)
            for j, k in enumerate(chunk):
                results[k] = (np.asarray(recs[j]), reread[j].bpp,
                              reread[j], dt)
    return results


def main(argv=None):
    args = get_parser().parse_args(argv)
    enable_compilation_cache()
    rc, rm = args.ratios

    os.makedirs(args.output_dir, exist_ok=True)
    stream_dir = os.path.join(args.output_dir, "streams")
    codec = build_codec(args.ckpt, use_ema=args.use_ema)
    dataset = EvalImageDataset(args.images_dir,
                               images_range=tuple(args.images_range))
    print(f"Found {len(dataset)} images; ratios=({rc}, {rm}, "
          f"{1 - rc - rm:.3f})")

    lpips_fn = None
    if args.lpips:
        import jax
        import jax.numpy as jnp
        from ..models.lpips import LPIPS, with_bundled_lin_heads
        lpips_mod = LPIPS(net=args.lpips_net)
        lpips_vars = lpips_mod.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 64, 64, 3)))
        lpips_vars = {"params": with_bundled_lin_heads(
            lpips_vars["params"], args.lpips_net)}
        print("NOTE: lin heads are the reference v0.1 weights; the ImageNet "
              "backbone is random-init unless ported — values are relative "
              "only until a backbone is supplied.")

        def lpips_fn(a, b):
            return float(lpips_mod.apply(
                lpips_vars, jnp.asarray(a)[None], jnp.asarray(b)[None],
                normalize=True)[0])

    batched = args.batch > 1 and not args.write_partition_map
    results = {}
    if batched:
        results = _compress_batched(codec, dataset, rc, rm, args.batch,
                                    stream_dir, args.device_pack)

    bpps, psnrs, lpipses = [], [], []
    log_path = os.path.join(args.output_dir, "bpp.txt")
    with open(log_path, "w") as log:
        for k in range(len(dataset)):
            if batched:
                img = dataset[k]
                rec, bpp, enc, dt = results[k]
            else:
                img = dataset[k]
                t0 = time.time()
                rec, bpp, enc = codec.compress(
                    img, rc, rm, out_dir=stream_dir,
                    device_pack=args.device_pack)
                dt = time.time() - t0
            p = psnr(np.clip(rec, 0, 1), img)
            bpps.append(bpp)
            psnrs.append(p)
            if lpips_fn is not None:
                lpipses.append(lpips_fn(np.clip(rec, 0, 1), img))
            save_png(os.path.join(args.output_dir, f"{k:03d}_{bpp:0.5f}.png"),
                     rec)
            if args.write_partition_map:
                fn = codec._encode_fn(float(rc), float(rm))
                out = fn(codec.variables, np.asarray(img)[None])
                if args.partition_map_style == "color":
                    pm = draw_partition_map_color(
                        np.asarray(img)[None], np.asarray(out.grain_indices))
                else:
                    pm = draw_partition_map(np.asarray(img)[None],
                                            np.asarray(out.grain_indices),
                                            line_value=0.0)
                save_png(os.path.join(args.output_dir, f"{k:03d}_map.png"),
                         pm[0])
            line = (f"{k:03d}: bpp={bpp:.5f} psnr={p:.2f}dB "
                    + (f"lpips={lpipses[-1]:.5f} " if lpipses else "")
                    + f"mode={enc.mode} {dt:.2f}s")
            print(line)
            log.write(line + "\n")
        avg = (f"average: bpp={np.mean(bpps):.5f} "
               f"psnr={np.mean(psnrs):.2f}dB "
               + (f"lpips={np.mean(lpipses):.5f} " if lpipses else "")
               + f"over {len(bpps)} images")
        print(avg)
        log.write(avg + "\n")


if __name__ == "__main__":
    main()
