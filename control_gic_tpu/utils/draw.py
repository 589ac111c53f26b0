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
