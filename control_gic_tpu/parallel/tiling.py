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

import os
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


def _tile_fns(codec: CGICCodec) -> dict:
    cache = getattr(codec, "_tile_fns", None)
    if cache is None:
        cache = {}
        codec._tile_fns = cache
    return cache


def _encode_tiles_fn(codec: CGICCodec, rc: float, rm: float,
                     offsets: tuple, th: int, tw: int):
    """Jitted: whole padded image [H, W, 3] (uint8 or float) -> fused
    packed-stream buffer for the batch of tiles at `offsets`. The tiles
    are sliced ON DEVICE, so the image crosses the wire once per image
    instead of once per tile batch."""
    import jax
    import jax.numpy as jnp

    key = ("enc", rc, rm, offsets, th, tw)
    cache = _tile_fns(codec)
    if key not in cache:
        from ..coding.stream_pack import fuse_packed, pack_streams_batch
        from ..models.cgic import CGIC
        from ..ops.router import mode_from_ratios

        if codec._device_tables is None:
            raise ValueError(
                "compress_tiled_device needs device-packable Huffman tables "
                "(codes <= 32 bits); this codec's table does not qualify — "
                "use compress_tiled()/compress_tiled_many() instead")
        lens, words = codec._device_tables
        max_code_len = int(lens.max()) if lens.size else 1
        mode = mode_from_ratios(rc, rm)

        def fn(v, image):
            tiles = jnp.stack([image[y:y + th, x:x + tw] for y, x in offsets])
            enc = codec.model.apply(v, codec._to_float(tiles), rc, rm,
                                    per_sample=True, method=CGIC.encode)
            packed = pack_streams_batch(enc.indices, enc.router.masks,
                                        enc.router.mode, lens, words,
                                        max_code_len)
            return fuse_packed(packed, mode)

        cache[key] = jax.jit(fn)
    return cache[key]


def _decode_stitch_fn(codec: CGICCodec, mode: int, offsets: tuple, th: int,
                      tw: int, out_uint8: bool):
    """Jitted: (canvas [H, W, 3], compact receiver buffer) -> canvas with
    the decoded tiles written at `offsets`. The canvas stays on device
    across tile groups (donated), so the reconstruction crosses the wire
    once per image; the receiver upload is the compact uint16+bitmap
    format (codec.split_compact_buf)."""
    import jax
    import jax.numpy as jnp

    from ..models.cgic import CGIC

    key = ("dec", mode, offsets, th, tw, out_uint8)
    cache = _tile_fns(codec)
    if key not in cache:
        hl, wl = th // 4, tw // 4

        def fn(v, canvas, buf):
            ind, masks = codec.split_compact_buf(buf, mode, hl, wl)
            rec = codec.model.apply(v, ind, masks,
                                    method=CGIC.decode_indices)
            if out_uint8:
                rec = (jnp.clip(rec, 0.0, 1.0) * 255).astype(jnp.uint8)
            else:
                rec = rec.astype(canvas.dtype)
            for j, (y, x) in enumerate(offsets):
                canvas = jax.lax.dynamic_update_slice(canvas, rec[j],
                                                      (y, x, 0))
            return canvas

        donate = (1,) if jax.default_backend() != "cpu" else ()
        cache[key] = jax.jit(fn, donate_argnums=donate)
    return cache[key]


def _decode_stitch_unpack_fn(codec: CGICCodec, mode: int, offsets: tuple,
                             th: int, tw: int, out_uint8: bool):
    """Jitted: (canvas, flat bitstream words, word-offset table) -> canvas
    with the tiles decoded ON DEVICE (parallel Huffman decode + grid
    rebuild, codec.make_rebuild_batch) and stitched at `offsets`. The
    receiver H2D is the compressed payload itself."""
    import jax
    import jax.numpy as jnp

    from ..codec import make_rebuild_batch, unpack_impl
    from ..models.cgic import CGIC

    key = ("decu", mode, offsets, th, tw, out_uint8, unpack_impl())
    cache = _tile_fns(codec)
    if key not in cache:
        rebuild = make_rebuild_batch(codec._decode_tables[2], mode,
                                     th // 4, tw // 4)

        def fn(v, canvas, flat, offs, lut_s, lut_l):
            ind, m_c, m_m, m_f = rebuild(flat, offs, lut_s, lut_l)
            rec = codec.model.apply(v, ind, (m_c, m_m, m_f),
                                    method=CGIC.decode_indices)
            if out_uint8:
                rec = (jnp.clip(rec, 0.0, 1.0) * 255).astype(jnp.uint8)
            else:
                rec = rec.astype(canvas.dtype)
            for j, (y, x) in enumerate(offsets):
                canvas = jax.lax.dynamic_update_slice(canvas, rec[j],
                                                      (y, x, 0))
            return canvas

        donate = (1,) if jax.default_backend() != "cpu" else ()
        cache[key] = jax.jit(fn, donate_argnums=donate)
    return cache[key]


def compress_tiled_device(codec: CGICCodec, images, coarse_ratio: float,
                          medium_ratio: float, tile: int = 768,
                          out_uint8: bool = True, threads: bool = True,
                          device_unpack: Optional[bool] = None
                          ) -> List[Tuple[np.ndarray, float,
                                          List[EncodedImage]]]:
    """Wire-minimal tiled codec over a sequence of images.

    Per image, exactly TWO large transfers cross the host<->device link —
    the (uint8) source image up, the (uint8) stitched reconstruction down —
    plus the few-KB packed entropy streams. Tile slicing and reconstruction
    stitching happen on device; the host only runs the entropy stage. A
    remote-attached chip (~30 MB/s tunnel) makes this the difference
    between wire-bound and compute-bound: the float path of
    compress_tiled_many moves 8x the bytes (f32 both ways) through
    per-tile-group transfers.

    Streams/bpp are identical to compress_tiled(overlap=0) (pinned by
    test_tiling); the reconstruction differs only by the uint8 PNG
    quantization (clip -> *255 -> trunc, same as cli.common.save_png) when
    out_uint8=True.

    device_unpack=True decodes the bitstreams ON DEVICE
    (codec.decode_batch device_unpack semantics): the receiver-side H2D
    shrinks from the compact host upload (~450 KB per 2K image, uint16
    grids + bitmap masks) to the compressed payload itself (few KB).
    Pinned pixel-identical by test_tiling. Default (None) is the HOST
    receiver since round 5: the two measured within noise of each other
    end-to-end (0.644 devrx vs 0.661 hostrx img/s driver-style, same
    session), but the device receiver's lock-step scan decode inherits
    the axon runtime's degraded-session loop-carried slowness (measured
    5-8x on scans; codec256 devrx 36.0 vs hostrx 54.4 img/s in such a
    session) while the host path is immune — robustness wins the tie.

    Returns [(reconstruction, bpp, bundles), ...] in input order.
    """
    import queue
    import threading
    import time

    import jax
    import jax.numpy as jnp

    from ..ops.router import mode_from_ratios

    assert tile % 16 == 0, f"tile must be a multiple of 16, got {tile}"
    if device_unpack is None:
        device_unpack = False       # see docstring: robustness default
    assert not device_unpack or codec._decode_tables is not None
    trace = os.environ.get("CONTROL_GIC_PIPE_TRACE") == "1"
    from collections import defaultdict
    stats = defaultdict(float)   # stages write disjoint keys across threads
    stats["device_unpack"] = float(device_unpack)
    t_run0 = time.perf_counter()

    def _tr(msg):
        if trace:
            print(f"[pipe {time.perf_counter() - t_run0:7.3f}s] {msg}",
                  flush=True)

    images = list(images)
    n = len(images)
    mode = mode_from_ratios(coarse_ratio, medium_ratio)
    out: List[Optional[Tuple]] = [None] * n
    errors: List[BaseException] = []

    # ---- plan: per image padding + shape-grouped tile offsets (tile index
    # kept so bundles come back in reference grid order)
    plans = []
    for image in images:
        h0, w0, _ = image.shape
        (pl, pr, pt, pb), _ = compute_padding(h0, w0)
        tiles = tile_grid(h0 + pt + pb, w0 + pl + pr, tile)
        groups: Dict[Tuple[int, int],
                     List[Tuple[int, int, int]]] = defaultdict(list)
        for t, (y, x, th, tw) in enumerate(tiles):
            groups[(th, tw)].append((t, y, x))
        plans.append(((pt, pb, pl, pr), h0, w0, dict(groups), len(tiles)))

    def pad_host(i):
        (pt, pb, pl, pr), _, _, _, _ = plans[i]
        return np.pad(images[i], ((pt, pb), (pl, pr), (0, 0)))

    def stage_a(i):
        """H2D image once; dispatch every tile group's encode+pack."""
        t0 = time.perf_counter()
        _, _, _, groups, _ = plans[i]
        _tr(f"A{i} start (pad+H2D)")
        img_dev = jnp.asarray(pad_host(i))
        bufs = []
        for (th, tw), tyx in groups.items():
            offs = tuple((y, x) for _, y, x in tyx)
            fn = _encode_tiles_fn(codec, float(coarse_ratio),
                                  float(medium_ratio), offs, th, tw)
            buf = fn(codec.variables, img_dev)
            try:  # schedule the packed-words D2H as soon as encode lands
                buf.copy_to_host_async()
            except AttributeError:
                pass
            bufs.append(((th, tw), tyx, offs, buf))
        _tr(f"A{i} dispatched")
        stats["a_upload_s"] += time.perf_counter() - t0
        stats["a_upload_bytes"] += getattr(images[i], "nbytes", 0)
        return img_dev, bufs

    def stage_b(i, item):
        """Fetch packed words, host entropy stage, dispatch decode+stitch."""
        from ..coding.stream_pack import fused_to_bytes

        img_dev, bufs = item
        (pt, pb, pl, pr), h0, w0, groups, n_tiles = plans[i]
        h, w = h0 + pt + pb, w0 + pl + pr
        dt = jnp.uint8 if out_uint8 else jnp.float32
        canvas = jnp.zeros((h, w, 3), dt)
        bundles: List[Optional[EncodedImage]] = [None] * n_tiles
        _tr(f"B{i} start (pack fetch)")
        for (th, tw), tyx, offs, buf in bufs:
            t0 = time.perf_counter()
            try:     # split "encode still computing" from "D2H wire"
                buf.block_until_ready()
            except AttributeError:
                pass
            t1 = time.perf_counter()
            buf = np.asarray(buf)
            stats["b_sync_s"] += t1 - t0
            stats["b_fetch_s"] += time.perf_counter() - t1
            stats["b_fetch_bytes"] += buf.nbytes
            _tr(f"B{i} pack fetched ({buf.nbytes >> 10} KB)")
            t0 = time.perf_counter()
            layout = codec._pack_layout(mode, th // 4, tw // 4)
            encs = [EncodedImage(mode=mode, latent_hw=(th // 4, tw // 4),
                                 image_hw=(th, tw),
                                 streams=fused_to_bytes(buf, layout, j))
                    for j in range(len(offs))]
            for (t, _, _), e in zip(tyx, encs):
                bundles[t] = e
            if device_unpack:
                flat, offtbl = codec._flat_stream_upload(encs)
                stats["b_rebuild_s"] += time.perf_counter() - t0
                lut_s, lut_l = codec._decode_luts_on_device()
                fn = _decode_stitch_unpack_fn(codec, mode, offs, th, tw,
                                              out_uint8)
                t0 = time.perf_counter()
                canvas = fn(codec.variables, canvas, jnp.asarray(flat),
                            jnp.asarray(offtbl), lut_s, lut_l)
                stats["b_h2d_dispatch_s"] += time.perf_counter() - t0
                stats["b_h2d_bytes"] += flat.nbytes + offtbl.nbytes
            else:
                inds = [codec._rebuild(e)[0] for e in encs]
                dec_in = codec._compact_decode_input(encs, inds)
                stats["b_rebuild_s"] += time.perf_counter() - t0
                fn = _decode_stitch_fn(codec, mode, offs, th, tw, out_uint8)
                t0 = time.perf_counter()
                canvas = fn(codec.variables, canvas,
                            jnp.asarray(dec_in))
                stats["b_h2d_dispatch_s"] += time.perf_counter() - t0
                stats["b_h2d_bytes"] += dec_in.nbytes
        try:  # start the D2H as soon as the last stitch finishes
            canvas.copy_to_host_async()
        except AttributeError:
            pass
        _tr(f"B{i} decode dispatched")
        return bundles, canvas

    def stage_c(i, bundles, canvas):
        """Fetch the stitched reconstruction, unpad, account bpp."""
        (pt, pb, pl, pr), h0, w0, _, _ = plans[i]
        _tr(f"C{i} start (canvas fetch)")
        t0 = time.perf_counter()
        try:     # split "decode still computing" from "D2H wire"
            canvas.block_until_ready()
        except AttributeError:
            pass
        t1 = time.perf_counter()
        rec = np.asarray(canvas)
        stats["c_sync_s"] += t1 - t0
        stats["c_fetch_s"] += time.perf_counter() - t1
        stats["c_fetch_bytes"] += rec.nbytes
        _tr(f"C{i} canvas fetched")
        h, w = rec.shape[:2]
        rec = rec[pt:h - pb if pb else h, pl:w - pr if pr else w]
        bits = sum(e.num_bytes * 8 for e in bundles)
        out[i] = (rec, bits / (h0 * w0), bundles)

    def _finish():
        stats["wall_s"] = time.perf_counter() - t_run0
        codec.last_pipeline_stats = dict(stats)

    if not threads or n == 1:
        for i in range(n):
            bundles, canvas = stage_b(i, stage_a(i))
            stage_c(i, bundles, canvas)
        stats["threaded"] = 0.0
        _finish()
        return [o for o in out]

    qa: "queue.Queue" = queue.Queue(maxsize=1)
    qb: "queue.Queue" = queue.Queue(maxsize=1)

    def worker_b():
        while True:
            item = qa.get()
            if item is None:
                qb.put(None)
                return
            if errors:
                continue
            i, a = item
            try:
                bundles, canvas = stage_b(i, a)
                qb.put((i, bundles, canvas))
            except BaseException as e:
                errors.append(e)

    def worker_c():
        while True:
            item = qb.get()
            if item is None:
                return
            if errors:
                continue
            try:
                stage_c(*item)
            except BaseException as e:
                errors.append(e)

    tb = threading.Thread(target=worker_b, daemon=True)
    tc = threading.Thread(target=worker_c, daemon=True)
    tb.start()
    tc.start()
    try:
        for i in range(n):
            if errors:
                break
            qa.put((i, stage_a(i)))
    finally:
        # always unblock the workers, even if stage_a raised mid-pipeline
        qa.put(None)
        tb.join()
        tc.join()
    stats["threaded"] = 1.0
    _finish()
    if errors:
        raise errors[0]
    return [o for o in out]


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
