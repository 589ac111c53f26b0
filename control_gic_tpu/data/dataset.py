"""Image data pipeline — PIL + NumPy + a threaded prefetcher (no torch).

Two dataset conventions, matching the reference exactly:
  - training (/root/reference/CGIC/data/dataset.py:56-86): recursive glob of
    jpg/png, center-crop to square, bicubic resize (reducing_gap=1) to
    image_size, scaled to [-1, 1], NHWC float32.
  - eval (/root/reference/inference.py:34-79): recursive glob of
    jpg/jpeg/png, center-crop each image to the largest /16-divisible size
    (no resize), scaled to [0, 1].

The prefetcher overlaps PIL decode (host) with TPU compute via a small
thread pool + bounded queue — the stand-in for torch DataLoader workers.
"""
from __future__ import annotations

import glob as globlib
import os
import queue
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

_EXTS = (".jpg", ".jpeg", ".png")


def _list_images(root: str, recursive: bool = True) -> List[str]:
    out = []
    if recursive:
        for ext in ("*.jpg", "*.jpeg", "*.png"):
            out += globlib.glob(os.path.join(root, "**", ext), recursive=True)
            out += globlib.glob(os.path.join(root, ext))
    else:
        for ext in ("*.jpg", "*.jpeg", "*.png"):
            out += globlib.glob(os.path.join(root, ext))
    return sorted(set(out))


def _center_crop_square(img):
    w, h = img.size
    s = min(w, h)
    left, top = (w - s) // 2, (h - s) // 2
    return img.crop((left, top, left + s, top + s))


class ImageFolderDataset:
    """Training dataset: square center-crop + bicubic resize, [-1, 1]."""

    def __init__(self, root: str, image_size: int = 256):
        assert Image is not None, "PIL required"
        self.paths = _list_images(root)
        self.image_size = image_size

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, i: int) -> np.ndarray:
        img = Image.open(self.paths[i]).convert("RGB")
        img = _center_crop_square(img)
        img = img.resize((self.image_size, self.image_size),
                         resample=Image.BICUBIC, reducing_gap=1)
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        return arr                                       # [H, W, 3] in [-1,1]


class EvalImageDataset:
    """Eval dataset: center-crop to /16 multiples, [0, 1], no resize."""

    def __init__(self, root: str,
                 images_range: Tuple[int, int] = (0, -1)):
        assert Image is not None, "PIL required"
        self.paths = _list_images(root)
        if images_range[1] > 0:
            self.paths = self.paths[images_range[0]:images_range[1]]

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, i: int) -> np.ndarray:
        img = Image.open(self.paths[i]).convert("RGB")
        w, h = img.size
        tw, th = (w // 16) * 16, (h // 16) * 16
        # torchvision center_crop computes the origin with round() — banker's
        # rounding on the half-pixel for odd margins (inference.py:62-67);
        # match it so crops (and therefore streams) are identical.
        left, top = round((w - tw) / 2), round((h - th) / 2)
        img = img.crop((left, top, left + tw, top + th))
        return np.asarray(img, np.float32) / 255.0       # [H, W, 3] in [0,1]


def prefetch_batches(dataset, batch_size: int, *, shuffle: bool = True,
                     seed: int = 0, num_threads: int = 4,
                     drop_last: bool = True,
                     epochs: Optional[int] = None,
                     start_step: int = 0) -> Iterator[np.ndarray]:
    """Yield [B, H, W, 3] batches with threaded decode + bounded prefetch.

    Each epoch's shuffle is derived from (seed, epoch), so the stream is a
    pure function of position: resuming with start_step=N yields exactly
    the batches a fresh run would yield from its (N+1)-th batch on — the
    reference's Lightning resume restores epoch position the same way
    (main.py:130-134). `epochs` counts absolute epochs (a resume inside
    epoch 3 of epochs=5 runs the remaining 2+).
    """
    n = len(dataset)
    per_epoch = (n // batch_size) if drop_last else -(-n // batch_size)
    stop = threading.Event()
    q: "queue.Queue" = queue.Queue(maxsize=8)

    def order_iter():
        epoch, skip = divmod(start_step, max(per_epoch, 1))
        while epochs is None or epoch < epochs:
            rng = np.random.default_rng((seed, epoch))
            idx = np.arange(n)
            if shuffle:
                rng.shuffle(idx)
            batches = [idx[i:i + batch_size]
                       for i in range(0, n, batch_size)
                       if (not drop_last) or i + batch_size <= n]
            yield from batches[skip:]
            skip = 0
            epoch += 1

    def worker():
        try:
            for batch_idx in order_iter():
                if stop.is_set():
                    return
                imgs = [dataset[int(i)] for i in batch_idx]
                q.put(np.stack(imgs))
        finally:
            q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            yield item
    finally:
        stop.set()
