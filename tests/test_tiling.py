"""Tiling grid/pad/window unit tests (no model compute)."""
import numpy as np
import pytest

from control_gic_tpu.parallel.tiling import (compute_padding,
                                             gaussian_tile_weights,
                                             overlapping_tile_grid, tile_grid)


def test_compute_padding():
    (l, r, t, b), unpad = compute_padding(100, 130)
    assert (100 + t + b) % 16 == 0 and (130 + l + r) % 16 == 0
    assert unpad == (-l, -r, -t, -b)
    assert compute_padding(96, 128)[0] == (0, 0, 0, 0)


def test_tile_grid_reference_semantics():
    tiles = tile_grid(800, 768, 768)
    # rows: 768 tile + 32 remainder; cols: exactly one
    assert (0, 0, 768, 768) in tiles
    assert (768, 0, 32, 768) in tiles
    assert len(tiles) == 2
    # full coverage, no overlap
    cover = np.zeros((800, 768), np.int32)
    for y, x, th, tw in tiles:
        cover[y:y + th, x:x + tw] += 1
    assert (cover == 1).all()


def test_overlapping_tile_grid_full_coverage():
    tiles = overlapping_tile_grid(1000, 700, 512, 64)
    cover = np.zeros((1000, 700), np.int32)
    for y, x, th, tw in tiles:
        assert th == 512 or th == 1000 or th == 700
        cover[y:y + th, x:x + tw] += 1
    assert (cover >= 1).all()
    assert cover.max() >= 2          # overlap happened somewhere


def test_gaussian_weights_shape_and_center_peak():
    w = gaussian_tile_weights(64, 64)
    assert w.shape == (64, 64)
    assert w[32, 31] == w.max() or w[32, 32] == w.max()
    assert w.min() > 0
