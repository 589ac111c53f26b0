"""High-resolution tiled codec: pad -> tile -> batched per-tile codec -> stitch.

Behavioral contract: /root/reference/inference_high_resolution.py —
  - center zero-pad to a /16-divisible size (compute_padding :145-173)
  - non-overlapping tile grid of `tile_size` px (+ remainder tiles)
    (nonoverlapping_grid_indices :112-125)
  - every tile compressed independently through the full codec
  - bpp = sum(tile_bits) / original (unpadded) pixel count (:250,256)
  - the reference's Gaussian tile blending is a mathematical no-op for
    non-overlapping tiles (SURVEY.md §2.4.7) and is dropped.

TPU-first differences: tiles of the same shape are *batched* through one
jitted encode/decode (per-sample routing keeps each tile's streams identical
to a solo pass), instead of a Python loop over 1-image programs. On a
multi-device mesh the tile batch is sharded over the 'data' axis — tile
parallelism without halo exchange, since tiles are independent by
construction.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..codec import CGICCodec, EncodedImage


def compute_padding(h: int, w: int, min_div: int = 16
                    ) -> Tuple[Tuple[int, int, int, int],
                               Tuple[int, int, int, int]]:
    """(left, right, top, bottom) center padding to /min_div, + unpad."""
    out_h = (h + min_div - 1) // min_div * min_div
    out_w = (w + min_div - 1) // min_div * min_div
    left = (out_w - w) // 2
    right = out_w - w - left
    top = (out_h - h) // 2
    bottom = out_h - h - top
    return (left, right, top, bottom), (-left, -right, -top, -bottom)


def tile_grid(h: int, w: int, tile: int
              ) -> List[Tuple[int, int, int, int]]:
    """List of (y, x, th, tw) covering [h, w] with `tile`-px tiles plus
    remainder tiles (reference grid semantics)."""
    ys = list(range(0, h, tile))
    xs = list(range(0, w, tile))
    out = []
    for y in ys:
        for x in xs:
            out.append((y, x, min(tile, h - y), min(tile, w - x)))
    return out


def overlapping_tile_grid(h: int, w: int, tile: int, overlap: int
                          ) -> List[Tuple[int, int, int, int]]:
    """Equal-size tiles at stride tile-overlap, last tile snapped to the
    border so coverage is complete. Falls back to the non-overlapping grid
    along a dim smaller than `tile`."""
    def starts(dim):
        if dim <= tile:
            return [0]
        stride = tile - overlap
        s = list(range(0, dim - tile + 1, stride))
        if s[-1] != dim - tile:
            s.append(dim - tile)
        return s

    out = []
    for y in starts(h):
        for x in starts(w):
            out.append((y, x, min(tile, h - y), min(tile, w - x)))
    return out


def gaussian_tile_weights(th: int, tw: int) -> np.ndarray:
    """Per-pixel blending weights for overlapped tiles (the reference's
    _gaussian_weights, inference_high_resolution.py:127-143: var 0.01,
    normalized Gaussian over relative position). [th, tw] float32."""
    var = 0.01
    mid_w = (tw - 1) / 2
    xp = np.exp(-((np.arange(tw) - mid_w) ** 2) / (tw * tw) / (2 * var)) \
        / np.sqrt(2 * np.pi * var)
    mid_h = th / 2
    yp = np.exp(-((np.arange(th) - mid_h) ** 2) / (th * th) / (2 * var)) \
        / np.sqrt(2 * np.pi * var)
    return np.outer(yp, xp).astype(np.float32)


def compress_tiled(codec: CGICCodec, image: np.ndarray, coarse_ratio: float,
                   medium_ratio: float, tile: int = 768,
                   overlap: int = 0, mesh=None, device_pack: bool = False
                   ) -> Tuple[np.ndarray, float, List[EncodedImage]]:
    """Compress an arbitrary-size image by independent tiles.

    Args:
      image: [H, W, 3] float.
      overlap: 0 (default) reproduces the reference's non-overlapping grid
        bit-exactly. >0 (multiple of 16) overlaps tiles and blends them
        with the reference's Gaussian window — removes visible seams at the
        cost of re-coding the overlapped pixels (higher bpp).
      mesh: optional jax Mesh — tile batches are sharded over its 'data'
        axis for multi-device tile parallelism.

    Returns (reconstruction [H, W, 3], bpp over original pixels, bundles).
    """
    assert overlap % 16 == 0 and 0 <= overlap < tile, overlap
    h0, w0, _ = image.shape
    (pl, pr, pt, pb), _ = compute_padding(h0, w0)
    padded = np.pad(image, ((pt, pb), (pl, pr), (0, 0)))
    h, w, _ = padded.shape

    tiles = (tile_grid(h, w, tile) if overlap == 0
             else overlapping_tile_grid(h, w, tile, overlap))
    # group by shape so each group runs as one batched jitted program
    groups: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    for i, (y, x, th, tw) in enumerate(tiles):
        # tiles must themselves be /16 (guaranteed: h, w are /16 and tile
        # boundaries fall on multiples of min(tile, remaining))
        groups[(th, tw)].append(i)

    recon = np.zeros_like(padded, dtype=np.float32)
    weight = np.zeros(padded.shape[:2] + (1,), np.float32)
    bundles: List[Optional[EncodedImage]] = [None] * len(tiles)
    total_bits = 0.0
    for (th, tw), idxs in groups.items():
        batch = np.stack([padded[tiles[i][0]:tiles[i][0] + th,
                                 tiles[i][1]:tiles[i][1] + tw] for i in idxs])
        if mesh is not None:
            import jax
            from .mesh import data_sharding
            if batch.shape[0] % mesh.devices.size == 0:
                batch = jax.device_put(batch, data_sharding(mesh))
        encs = codec.encode_batch(batch, coarse_ratio, medium_ratio,
                                  device_pack=device_pack)
        recs = codec.decode_batch(encs)
        wt = (gaussian_tile_weights(th, tw)[..., None] if overlap
              else np.ones((th, tw, 1), np.float32))
        for j, i in enumerate(idxs):
            y, x, _, _ = tiles[i]
            recon[y:y + th, x:x + tw] += recs[j] * wt
            weight[y:y + th, x:x + tw] += wt
            bundles[i] = encs[j]
            total_bits += encs[j].num_bytes * 8

    recon = recon / np.maximum(weight, 1e-12)
    recon = recon[pt:h - pb if pb else h, pl:w - pr if pr else w]
    bpp = total_bits / (h0 * w0)
    return recon, bpp, [b for b in bundles if b is not None]


def compress_tiled_many(codec: CGICCodec, images, coarse_ratio: float,
                        medium_ratio: float, tile: int = 768,
                        mesh=None, device_pack: bool = False
                        ) -> List[Tuple[np.ndarray, float,
                                        List[EncodedImage]]]:
    """Pipelined tiled codec over a sequence of images (the DIV2K/CLIC eval
    shape of work: many images through the same tile grids).

    Per-image results are identical to compress_tiled(overlap=0) — same
    tile batches through the same jitted programs — but the schedule is
    software-pipelined across tile-shape groups AND images: while the host
    frames/rebuilds group k's bitstreams, the device is already encoding
    group k+1 (possibly of the next image), and group k-1's decode drains
    asynchronously. See codec.encode_batch_async/decode_batch_async.

    Returns [(reconstruction, bpp, bundles), ...] in input order.
    """
    images = list(images)
    # ---- plan: per image padding/grid; flat job list over shape groups
    plans = []        # (padded, (pt,pb,pl,pr), h0, w0, tiles)
    jobs = []         # (img_i, (th, tw), idxs)
    for i, image in enumerate(images):
        h0, w0, _ = image.shape
        (pl, pr, pt, pb), _ = compute_padding(h0, w0)
        padded = np.pad(image, ((pt, pb), (pl, pr), (0, 0)))
        tiles = tile_grid(padded.shape[0], padded.shape[1], tile)
        groups: Dict[Tuple[int, int], List[int]] = defaultdict(list)
        for j, (y, x, th, tw) in enumerate(tiles):
            groups[(th, tw)].append(j)
        plans.append((padded, (pt, pb, pl, pr), h0, w0, tiles))
        for key, idxs in groups.items():
            jobs.append((i, key, idxs))

    def batch_for(job):
        i, (th, tw), idxs = job
        padded, _, _, _, tiles = plans[i]
        batch = np.stack([padded[tiles[j][0]:tiles[j][0] + th,
                                 tiles[j][1]:tiles[j][1] + tw]
                          for j in idxs])
        if mesh is not None:
            import jax
            from .mesh import data_sharding
            if batch.shape[0] % mesh.devices.size == 0:
                batch = jax.device_put(batch, data_sharding(mesh))
        return batch

    # ---- pipelined execution over jobs
    state = [  # per image: recon, weight-free stitch, bundles, bits
        (np.zeros_like(p[0], dtype=np.float32),
         [None] * len(p[4]), [0.0]) for p in plans]

    def stitch(job, encs, rec):
        i, (th, tw), idxs = job
        recon, bundles, bits = state[i]
        tiles = plans[i][4]
        for j, t in enumerate(idxs):
            y, x, _, _ = tiles[t]
            recon[y:y + th, x:x + tw] = rec[j]
            bundles[t] = encs[j]
            bits[0] += encs[j].num_bytes * 8

    pend = None                      # (job, encs, rec_device)
    pend_e = (codec.encode_batch_async(batch_for(jobs[0]), coarse_ratio,
                                       medium_ratio, device_pack=device_pack)
              if jobs else None)
    for k, job in enumerate(jobs):
        nxt = (codec.encode_batch_async(batch_for(jobs[k + 1]), coarse_ratio,
                                        medium_ratio,
                                        device_pack=device_pack)
               if k + 1 < len(jobs) else None)
        encs = codec.encode_finish(pend_e)
        if pend is not None:
            stitch(pend[0], pend[1], np.asarray(pend[2]))
        pend = (job, encs, codec.decode_batch_async(encs))
        pend_e = nxt
    if pend is not None:
        stitch(pend[0], pend[1], np.asarray(pend[2]))

    out = []
    for i, (padded, (pt, pb, pl, pr), h0, w0, tiles) in enumerate(plans):
        recon, bundles, bits = state[i]
        h, w = padded.shape[:2]
        recon = recon[pt:h - pb if pb else h, pl:w - pr if pr else w]
        out.append((recon, bits[0] / (h0 * w0),
                    [b for b in bundles if b is not None]))
    return out
