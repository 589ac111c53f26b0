"""Partition-map rendering — vectorized (the reference draws with triple
Python pixel loops, draw.py:78-119).

Contract: given images [B, H, W, 3] and the fine-grid partition map
indices [B, Hl, Wl] (0=coarse, 1=medium, 2=fine), draw cell borders:
  - coarse 4x4-cell grid lines everywhere,
  - medium cell borders where the cell's top-left fine index == 1,
  - fine cell borders where the fine index == 2,
with the border pixels set to the image minimum (-1 in train range, 0 in
eval range), matching the reference's `= -1` on [-1,1] images.
"""
from __future__ import annotations

import numpy as np

# Named blend colors (reference draw.py:12-18).
COLOR_DICT = {
    "red": (255, 0, 0),
    "green": (0, 255, 0),
    "white": (255, 255, 255),
    "yellow": (255, 255, 0),
    "blue": (5, 39, 175),
}


def draw_partition_map(images: np.ndarray, indices: np.ndarray,
                       line_value: float = -1.0) -> np.ndarray:
    images = np.array(images, copy=True)
    b, h, w, _ = images.shape
    _, hl, wl = indices.shape
    sh, sw = h // hl, w // wl      # pixels per fine cell

    for bi in range(b):
        # coarse grid: every 4 fine cells
        ys = np.arange(0, hl // 4) * sh * 4
        xs = np.arange(0, wl // 4) * sw * 4
        images[bi, ys, :, :] = line_value
        images[bi, :, xs, :] = line_value

        # medium borders where top-left fine index of the 2x2 block == 1
        med = indices[bi, ::2, ::2] == 1     # [hl/2, wl/2]
        for (i, j) in zip(*np.nonzero(med)):
            y0, x0 = i * 2 * sh, j * 2 * sw
            images[bi, y0, x0:x0 + 2 * sw, :] = line_value
            images[bi, y0:y0 + 2 * sh, x0, :] = line_value

        # fine borders where index == 2
        fine = indices[bi] == 2
        for (i, j) in zip(*np.nonzero(fine)):
            y0, x0 = i * sh, j * sw
            images[bi, y0, x0:x0 + sw, :] = line_value
            images[bi, y0:y0 + sh, x0, :] = line_value
    return images


def _minmax_normalize(img: np.ndarray) -> np.ndarray:
    """Per-image min-max normalize to [0, 1] (the torchvision
    save_image(normalize=True) rule the reference applies, draw.py:20-39)."""
    lo, hi = float(img.min()), float(img.max())
    return np.clip((img - lo) / max(hi - lo, 1e-5), 0.0, 1.0)


def draw_partition_map_color(images: np.ndarray, indices: np.ndarray,
                             low_color: str = "blue",
                             high_color: str = "red",
                             scaler: float = 0.9) -> np.ndarray:
    """Color-blend partition overlay (reference draw.py:42-76), vectorized.

    A granularity heat map (0=coarse -> low_color, 2=fine -> high_color,
    linear in index/2) is nearest-upsampled to pixel resolution and
    alpha-blended over the min-max-normalized image:
      out = (1 - scaler) * image + scaler * colormap.
    The reference upsamples both axes by W//wl (square assumption,
    draw.py:50-53); here each axis uses its own factor so non-square
    images render correctly.

    Args: images [B, H, W, 3] (any range), indices [B, hl, wl] in {0,1,2}.
    Returns float32 [B, H, W, 3] in [0, 1].
    """
    b, h, w, _ = images.shape
    _, hl, wl = indices.shape
    low = np.asarray(COLOR_DICT[low_color], np.float32)
    high = np.asarray(COLOR_DICT[high_color], np.float32)

    s = (indices.astype(np.float32) / 2.0)[..., None]       # [B, hl, wl, 1]
    cmap = high * s + low * (1.0 - s)                        # [B, hl, wl, 3]
    # uint8 truncation before blending, as in the reference's np.uint8 cast
    cmap = np.floor(cmap).astype(np.float32) / 255.0
    cmap = cmap.repeat(h // hl, axis=1).repeat(w // wl, axis=2)

    out = np.empty((b, h, w, 3), np.float32)
    for bi in range(b):
        out[bi] = ((1.0 - scaler) * _minmax_normalize(images[bi])
                   + scaler * cmap[bi])
    return out
