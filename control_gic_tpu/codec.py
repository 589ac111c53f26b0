"""End-to-end codec pipeline: jitted transform + host entropy coding.

Mirrors the reference round-trip (/root/reference/CGIC/models/model.py:206-401)
as two separable stages that a real sender/receiver pair could run:

  sender:   encode_jit(image) -> index grid + grain masks (device)
            -> split per-grain streams (host, numpy)
            -> Huffman index streams + bitmap mask streams (C++/host)
  receiver: read streams -> rebuild masks + full index grid (host, numpy)
            -> decode_jit(indices, masks) -> RGB (device)

Stream inventory per compression mode (model.py:225-260):
  mode 0: indices coarse+medium+fine, masks coarse+medium
  mode 1: indices medium+fine, mask medium            (coarse ratio 0)
  mode 2: indices coarse+fine, mask coarse            (medium ratio 0)
  mode 3: indices coarse+medium, mask coarse          (fine ratio 0)
  mode 4/5/6: single all-{coarse,medium,fine} index stream, no masks
The fine mask is never transmitted — the receiver derives it as the
complement (model.py:280).

bpp accounting matches the reference: sum of written stream sizes (each
including its 8-bit pad header) * 8 / pixel count.

The per-grain index streams have data-dependent length, so the split stays
on host (SURVEY.md §7 "ragged per-grain index streams"); everything
shape-static is jitted.
"""
from __future__ import annotations

import dataclasses
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .coding import BitmapCodec, HuffmanCodec
from .coding.huffman_decode_tpu import (bitmap_decode_bits, build_decode_lut,
                                        frame_body_words,
                                        huffman_decode_bits,
                                        huffman_decode_bits_scan,
                                        supports_decode_table,
                                        words_from_frame)
from .coding.huffman_tpu import pack_tables, supports_table
from .coding.stream_pack import (fuse_packed, fused_layout, fused_to_bytes,
                                 pack_streams_batch)
from .models.cgic import CGIC
from .ops.router import mode_from_ratios

STREAM_FILES = {
    "indices_coarse": "indices_coarse.bin",
    "indices_medium": "indices_medium.bin",
    "indices_fine": "indices_fine.bin",
    "mask_coarse": "mask_coarse.bin",
    "mask_medium": "mask_medium.bin",
}

MODE_STREAMS = {
    0: ["indices_coarse", "indices_medium", "indices_fine",
        "mask_coarse", "mask_medium"],
    1: ["indices_medium", "indices_fine", "mask_medium"],
    2: ["indices_coarse", "indices_fine", "mask_coarse"],
    3: ["indices_coarse", "indices_medium", "mask_coarse"],
    4: ["indices_coarse"],
    5: ["indices_medium"],
    6: ["indices_fine"],
}


class CorruptStreamError(ValueError):
    """A bitstream decoded to an inconsistent symbol count for its mask."""


def _acc(stats: Optional[dict], key: str, val: float) -> None:
    """Accumulate into an optional stats dict (plain dicts welcome)."""
    if stats is not None:
        stats[key] = stats.get(key, 0.0) + val


@dataclasses.dataclass
class _PendingEncode:
    """Handle for an asynchronously dispatched encode (device arrays may
    still be computing). Exactly one of `packed`/`enc` is set."""
    mode: int
    latent_hw: Tuple[int, int]
    image_hw: Tuple[int, int]
    n: int
    packed: Optional[object] = None  # device_pack: fused payload buffer
    enc: Optional[object] = None     # raw EncodeOutput (indices + router)


@dataclasses.dataclass
class EncodedImage:
    """The bitstream bundle for one image."""
    mode: int
    latent_hw: Tuple[int, int]       # (Hl, Wl) of the fine index grid
    image_hw: Tuple[int, int]        # original pixel dims (for bpp)
    streams: Dict[str, bytes]

    @property
    def num_bytes(self) -> int:
        return sum(len(v) for v in self.streams.values())

    @property
    def bpp(self) -> float:
        return self.num_bytes * 8 / (self.image_hw[0] * self.image_hw[1])

    def write(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        for name in MODE_STREAMS[self.mode]:
            with open(os.path.join(path, STREAM_FILES[name]), "wb") as f:
                f.write(self.streams.get(name, b""))

    @classmethod
    def read(cls, path: str, mode: int, latent_hw: Tuple[int, int],
             image_hw: Tuple[int, int]) -> "EncodedImage":
        streams = {}
        for name in MODE_STREAMS[mode]:
            with open(os.path.join(path, STREAM_FILES[name]), "rb") as f:
                streams[name] = f.read()
        return cls(mode=mode, latent_hw=latent_hw, image_hw=image_hw,
                   streams=streams)


def _up2(m: np.ndarray) -> np.ndarray:
    return m.repeat(2, axis=-2).repeat(2, axis=-1)


def _up4(m: np.ndarray) -> np.ndarray:
    return m.repeat(4, axis=-2).repeat(4, axis=-1)


def unpack_caps(L: int, mode: int, hl: int, wl: int):
    """Static per-stream (name, symbol count, word capacity, is_bitmap)
    layout for the device-unpack receiver. Word capacities bound the
    dynamic_slice each stream reads from the flat upload buffer (one guard
    word past the largest peek position); L = the LUT's max code length."""
    nc, nm, nf = (hl // 4) * (wl // 4), (hl // 2) * (wl // 2), hl * wl
    sizes = {
        "indices_coarse": (nc, nc * L // 32 + 2, False),
        "indices_medium": (nm, nm * L // 32 + 2, False),
        "indices_fine": (nf, nf * L // 32 + 2, False),
        "mask_coarse": (nc, nc // 32 + 2, True),
        "mask_medium": (nm, nm // 32 + 2, True),
    }
    return [(name,) + sizes[name] for name in MODE_STREAMS[mode]]


def unpack_impl() -> str:
    """Which device Huffman-decode formulation the receiver uses:
      'scan' (default): batched lock-step LUT walk, one lax.scan step per
        symbol with S-lane gathers — the fast path on TPU, where large
        arbitrary gathers are slow (measured: the rank path cost ~0.7
        s/batch of pure gather/scatter time at the 256² codec shape).
      'rank': the fully-parallel jump-pointer list-ranking decoder —
        no serial chain at all; wins where gathers are cheap.
    Override with CONTROL_GIC_UNPACK_IMPL."""
    impl = os.environ.get("CONTROL_GIC_UNPACK_IMPL", "scan")
    if impl not in ("scan", "rank"):
        raise ValueError(f"CONTROL_GIC_UNPACK_IMPL must be 'scan' or "
                         f"'rank', got {impl!r}")
    return impl


def make_rebuild_batch(L: int, mode: int, hl: int, wl: int,
                       impl: Optional[str] = None):
    """Build the batched device receiver: (flat_words, word_offsets [B,S],
    lut_sym, lut_len) -> (index grids [B,hl,wl], m_c, m_m, m_f), on device.

    Device Huffman decode per stream (huffman_decode_tpu; impl: see
    unpack_impl), bitmap mask unpack, complement fine mask, front-packed
    symbols scattered back into their grain positions, grids interleaved —
    model.py:269-389 semantics. Shared by decode_batch(device_unpack=True)
    and the tiled codec's decode+stitch program."""
    impl = impl or unpack_impl()
    caps = unpack_caps(L, mode, hl, wl)
    hc, wc, hm, wm = hl // 4, wl // 4, hl // 2, wl // 2
    nc, nm, nf = hc * wc, hm * wm, hl * wl

    up2 = lambda g: g.repeat(2, axis=-2).repeat(2, axis=-1)
    up4 = lambda g: g.repeat(4, axis=-2).repeat(4, axis=-1)

    def scatter_syms(mask_grid, syms):
        """Front-packed symbols -> their mask positions (inverse of
        stream_pack.compact_masked); row-major rank via cumsum.
        mask_grid: [B, h, w]; syms: [B, n]."""
        b = mask_grid.shape[0]
        flat = mask_grid.reshape(b, -1)
        rank = jnp.clip(jnp.cumsum(flat, axis=-1) - 1, 0,
                        syms.shape[-1] - 1)
        return jnp.where(flat == 1,
                         jnp.take_along_axis(syms, rank, axis=-1),
                         0).reshape(mask_grid.shape)

    def rebuild_batch(flat, offs, lut_s, lut_l):
        blocks = {}
        for s, (name, _, cw, _) in enumerate(caps):
            blocks[name] = jax.vmap(
                lambda o: jax.lax.dynamic_slice(flat, (o,), (cw,)))(
                    offs[:, s])                              # [B, cw]
        b = offs.shape[0]

        def bitmap(name, n, h, w):
            return jax.vmap(
                lambda p: bitmap_decode_bits(p, n))(
                    blocks[name]).reshape(b, h, w)

        def huff(name, counts, n_sym):
            if impl == "scan":
                return huffman_decode_bits_scan(blocks[name], counts,
                                                lut_s, lut_l, n_sym, L)
            return jax.vmap(
                lambda p, c: huffman_decode_bits(p, c, lut_s, lut_l,
                                                 n_sym, L))(
                    blocks[name], counts)

        def msum(m):
            return m.sum(axis=(1, 2)).astype(jnp.int32)

        zeros = lambda h, w: jnp.zeros((b, h, w), jnp.int32)
        ones = lambda h, w: jnp.ones((b, h, w), jnp.int32)
        full = lambda n: jnp.full((b,), n, jnp.int32)

        if mode == 0:
            m_c = bitmap("mask_coarse", nc, hc, wc)
            m_m = bitmap("mask_medium", nm, hm, wm)
            m_f = 1 - up2(m_m) - up4(m_c)
            g_c = scatter_syms(m_c, huff("indices_coarse", msum(m_c), nc))
            g_m = scatter_syms(m_m, huff("indices_medium", msum(m_m), nm))
            g_f = scatter_syms(m_f, huff("indices_fine", msum(m_f), nf))
            ind = g_f + up2(g_m) + up4(g_c)
        elif mode == 1:
            m_m = bitmap("mask_medium", nm, hm, wm)
            m_f = 1 - up2(m_m)
            m_c = zeros(hc, wc)
            g_m = scatter_syms(m_m, huff("indices_medium", msum(m_m), nm))
            g_f = scatter_syms(m_f, huff("indices_fine", msum(m_f), nf))
            ind = g_f + up2(g_m)
        elif mode == 2:
            m_c = bitmap("mask_coarse", nc, hc, wc)
            m_f = 1 - up4(m_c)
            m_m = zeros(hm, wm)
            g_c = scatter_syms(m_c, huff("indices_coarse", msum(m_c), nc))
            g_f = scatter_syms(m_f, huff("indices_fine", msum(m_f), nf))
            ind = g_f + up4(g_c)
        elif mode == 3:
            m_c = bitmap("mask_coarse", nc, hc, wc)
            m_m = 1 - up2(m_c)
            m_f = zeros(hl, wl)
            g_c = scatter_syms(m_c, huff("indices_coarse", msum(m_c), nc))
            g_m = scatter_syms(m_m, huff("indices_medium", msum(m_m), nm))
            ind = up4(g_c) + up2(g_m)
        elif mode == 4:
            syms = huff("indices_coarse", full(nc), nc)
            ind = up4(syms.reshape(b, hc, wc))
            m_c, m_m, m_f = ones(hc, wc), zeros(hm, wm), zeros(hl, wl)
        elif mode == 5:
            syms = huff("indices_medium", full(nm), nm)
            ind = up2(syms.reshape(b, hm, wm))
            m_m, m_c, m_f = ones(hm, wm), zeros(hc, wc), zeros(hl, wl)
        else:
            syms = huff("indices_fine", full(nf), nf)
            ind = syms.reshape(b, hl, wl)
            m_f, m_c, m_m = ones(hl, wl), zeros(hc, wc), zeros(hm, wm)
        return ind, m_c, m_m, m_f

    return rebuild_batch


class CGICCodec:
    """Host-side orchestrator binding a CGIC model + entropy coders."""

    def __init__(self, model: CGIC, variables, counts):
        self.model = model
        self.variables = variables
        self.huffman = HuffmanCodec.from_counts(np.asarray(counts))
        self.bitmap = BitmapCodec()
        # the compact receiver ships index grids as uint16
        # (split_compact_buf); the reference codebook is 1024
        assert len(np.asarray(counts)) <= 65536, \
            "compact receiver buffer is uint16: codebook must be <= 65536"
        # Device-side packing needs all code lengths <= 32 bits (true for
        # any non-degenerate trained frequency table).
        self._device_tables = (pack_tables(self.huffman.codes)
                               if supports_table(self.huffman.codes) else None)
        # Device-side decoding (parallel LUT walk) needs lengths in
        # [1, MAX_LUT_BITS]; falls back to the host C++ decoder otherwise.
        self._decode_tables = (build_decode_lut(self.huffman.codes)
                               if supports_decode_table(self.huffman.codes)
                               else None)
        self._encode_fns = {}
        self._encode_pack_fns = {}
        self._decode_fns = {}
        self._decode_tables_dev = None   # lazily device-put LUTs
        # set by roundtrip_pipelined: per-stage seconds/bytes of the last
        # pipelined run (threads write disjoint keys, so no lock needed)
        self.last_pipeline_stats: Dict[str, float] = {}
        # which receiver the last decode_batch used: 'device' or 'host'
        self.last_decode_path: Optional[str] = None
        self._decode_fn = jax.jit(
            lambda v, idx, masks: self.model.apply(
                v, idx, masks, method=CGIC.decode_indices))

    @staticmethod
    def _mask_word_caps(hl: int, wl: int) -> Tuple[int, int]:
        """uint32 word capacities of the coarse/medium mask bitmap frame
        bodies (n bits + the 1..8-bit byte pad can spill one extra word
        past ceil(n/32))."""
        nc = (hl // 4) * (wl // 4)
        nm = (hl // 2) * (wl // 2)
        return (nc + 8 + 31) // 32, (nm + 8 + 31) // 32

    @staticmethod
    def split_compact_buf(buf: jnp.ndarray, mode: int, hl: int, wl: int):
        """Unpack the compact receiver buffer (one uint16 array per batch:
        [B, ind u16 | mask_coarse bitmap words | mask_medium bitmap words])
        into decode_indices arguments, deriving the absent masks on device
        exactly like the host rebuild (model.py:269-389): the fine mask is
        the complement, all-one/all-zero masks for the single-grain modes.

        The wire story: the previous receiver buffer shipped all four
        DECODED grids as int32 (nf+nc+nm+nf words); this one ships the
        index grid as uint16 plus the masks in their 1-bit WIRE format —
        4.5x fewer bytes, which matters on a ~30 MB/s tunnel-attached
        chip. Mask bitmaps are re-used verbatim from the stream frames."""
        b = buf.shape[0]
        nf = hl * wl
        hc, wc = hl // 4, wl // 4
        hm, wm = hl // 2, wl // 2
        nc, nm = hc * wc, hm * wm
        wcw, wmw = CGICCodec._mask_word_caps(hl, wl)
        present = MODE_STREAMS[mode]

        ind = buf[:, :nf].astype(jnp.int32).reshape(b, hl, wl)
        pos = nf

        def mask_at(p, nw, n, h, w):
            seg = buf[:, p:p + 2 * nw].reshape(b, nw, 2)
            words = jax.lax.bitcast_convert_type(seg, jnp.uint32)
            return jax.vmap(
                lambda pw: bitmap_decode_bits(pw, n))(words).reshape(b, h, w)

        up2 = lambda g: g.repeat(2, axis=-2).repeat(2, axis=-1)
        up4 = lambda g: g.repeat(4, axis=-2).repeat(4, axis=-1)
        zeros = lambda h, w: jnp.zeros((b, h, w), jnp.int32)
        ones = lambda h, w: jnp.ones((b, h, w), jnp.int32)

        m_c = m_m = None
        if "mask_coarse" in present:
            m_c = mask_at(pos, wcw, nc, hc, wc)
            pos += 2 * wcw
        if "mask_medium" in present:
            m_m = mask_at(pos, wmw, nm, hm, wm)
            pos += 2 * wmw
        if mode == 0:
            m_f = 1 - up2(m_m) - up4(m_c)
        elif mode == 1:
            m_f = 1 - up2(m_m)
            m_c = zeros(hc, wc)
        elif mode == 2:
            m_f = 1 - up4(m_c)
            m_m = zeros(hm, wm)
        elif mode == 3:
            m_m = 1 - up2(m_c)
            m_f = zeros(hl, wl)
        elif mode == 4:
            m_c, m_m, m_f = ones(hc, wc), zeros(hm, wm), zeros(hl, wl)
        elif mode == 5:
            m_m, m_c, m_f = ones(hm, wm), zeros(hc, wc), zeros(hl, wl)
        else:
            m_f, m_c, m_m = ones(hl, wl), zeros(hc, wc), zeros(hm, wm)
        return ind, (m_c, m_m, m_f)

    def _decode_fused_fn(self, mode: int, hl: int, wl: int, out_uint8: bool):
        """Receiver decode taking ONE compact uint16 buffer per batch (see
        split_compact_buf) — a single H2D transfer per batch (each
        device_put pays a tunnel round-trip) at near-wire-format size.
        out_uint8 additionally quantizes the reconstruction on device
        exactly like cli.common.save_png (clip -> *255 -> trunc), cutting
        the recon D2H fetch 4x."""
        key = (mode, hl, wl, out_uint8)
        if key not in self._decode_fns:
            def fn(v, buf):
                ind, masks = self.split_compact_buf(buf, mode, hl, wl)
                rec = self.model.apply(v, ind, masks,
                                       method=CGIC.decode_indices)
                if out_uint8:
                    rec = (jnp.clip(rec, 0.0, 1.0) * 255).astype(jnp.uint8)
                return rec

            self._decode_fns[key] = jax.jit(fn)
        return self._decode_fns[key]

    def _compact_decode_input(self, encoded: List[EncodedImage],
                              inds) -> np.ndarray:
        """Host half of the compact receiver upload: index grids as uint16
        + the mask bitmap frame bodies verbatim (already wire-format bytes
        in the bundles), one row per image. See split_compact_buf."""
        mode = encoded[0].mode
        hl, wl = encoded[0].latent_hw
        wcw, wmw = self._mask_word_caps(hl, wl)
        present = MODE_STREAMS[mode]
        rows = []
        for e, ind in zip(encoded, inds):
            parts = [np.asarray(ind, np.uint16).reshape(-1)]
            if "mask_coarse" in present:
                w, _ = words_from_frame(e.streams["mask_coarse"], wcw)
                parts.append(w.view(np.uint16))
            if "mask_medium" in present:
                w, _ = words_from_frame(e.streams["mask_medium"], wmw)
                parts.append(w.view(np.uint16))
            rows.append(np.concatenate(parts))
        return np.stack(rows)

    # ------------------------------------------- device-unpack receiver path

    def _unpack_caps(self, mode: int, hl: int, wl: int):
        return unpack_caps(self._decode_tables[2], mode, hl, wl)

    def _decode_luts_on_device(self):
        """Lazily device-put the decode LUTs once (they are 2^L entries;
        re-uploading per call would cost the wire)."""
        if self._decode_tables_dev is None:
            lut_sym, lut_len, _ = self._decode_tables
            self._decode_tables_dev = (jnp.asarray(lut_sym),
                                       jnp.asarray(lut_len))
        return self._decode_tables_dev

    def _decode_unpack_fn(self, mode: int, hl: int, wl: int, out_uint8: bool):
        """Fully-device receiver: ONE flat uint32 buffer holding every
        image's raw bitstream words (the actual few-KB compressed payload)
        + a per-(image, stream) word-offset table -> reconstruction.

        The bitstreams are Huffman-decoded on device by the parallel
        LUT-walk (coding/huffman_decode_tpu.py), masks unpacked from their
        bitmaps, the fine mask derived as the complement, symbols scattered
        into their grain grids, and the full index grid interleaved — the
        receiver rebuild of model.py:269-389 with zero host work and an
        H2D proportional to the COMPRESSED size (the host path uploads the
        decoded ~230 KB index+mask grids per Kodak image instead)."""
        key = ("unpack", mode, hl, wl, out_uint8, unpack_impl())
        if key not in self._decode_fns:
            rebuild = make_rebuild_batch(self._decode_tables[2], mode,
                                         hl, wl)

            def fn(v, flat, offs, lut_s, lut_l):
                ind, m_c, m_m, m_f = rebuild(flat, offs, lut_s, lut_l)
                rec = self.model.apply(v, ind, (m_c, m_m, m_f),
                                       method=CGIC.decode_indices)
                if out_uint8:
                    rec = (jnp.clip(rec, 0.0, 1.0) * 255).astype(jnp.uint8)
                return rec

            self._decode_fns[key] = jax.jit(fn)
        return self._decode_fns[key]

    def _flat_stream_upload(self, encoded: List[EncodedImage]
                            ) -> Tuple[np.ndarray, np.ndarray]:
        """Host: concatenate every bundle's raw payload words (pad headers
        stripped, big-endian byteswap to MSB-first uint32) into one flat
        buffer + per-(image, stream) word offsets. The upload size is the
        compressed size, not the grid size."""
        mode = encoded[0].mode
        caps = self._unpack_caps(mode, *encoded[0].latent_hw)
        offs = np.zeros((len(encoded), len(caps)), np.int32)
        blocks = []
        pos = 0
        for i, e in enumerate(encoded):
            for s, (name, _, cw, _) in enumerate(caps):
                words, _ = frame_body_words(e.streams[name])
                assert words.size <= cw, (name, words.size, cw)
                offs[i, s] = pos
                blocks.append(words)
                pos += words.size
        guard = max(cw for _, _, cw, _ in caps) + 1
        blocks.append(np.zeros(guard, np.uint32))
        flat = np.concatenate(blocks)
        # Pad to a quarter-octave size bucket: the flat buffer's length is
        # data-dependent (it IS the compressed payload), and every distinct
        # length would trigger a fresh XLA compile (~50 s over the remote
        # tunnel — observed live as b_h2d_dispatch outliers). Buckets cap
        # the shape count at ~4 per octave for <= 25% padding.
        n = max(int(flat.size), 1024)
        octave = 1 << (n.bit_length() - 1)
        step = max(octave // 4, 256)
        bucket = ((n + step - 1) // step) * step
        out = np.zeros(bucket, np.uint32)
        out[:flat.size] = flat
        return out, offs

    # ---------------------------------------------------------------- encode

    @staticmethod
    def _to_float(x: jnp.ndarray) -> jnp.ndarray:
        """uint8 inputs convert on device (x/255 — identical math to the
        host ToTensor() conversion, 4x smaller H2D transfer)."""
        if x.dtype == jnp.uint8:
            return x.astype(jnp.float32) / 255.0
        return x

    @staticmethod
    def _as_input(images) -> jnp.ndarray:
        """Host->device image upload; uint8 arrays ship as-is (see
        _to_float), anything else as float32."""
        if getattr(images, "dtype", None) == np.uint8:
            return jnp.asarray(images)
        return jnp.asarray(images, jnp.float32)

    def _encode_fn(self, rc: float, rm: float, per_sample: bool = False):
        key = (rc, rm, per_sample)
        if key not in self._encode_fns:
            self._encode_fns[key] = jax.jit(
                lambda v, x: self.model.apply(
                    v, self._to_float(x), rc, rm, per_sample=per_sample,
                    method=CGIC.encode))
        return self._encode_fns[key]

    def _encode_pack_fn(self, rc: float, rm: float, per_sample: bool):
        """One jitted program: neural encode + on-device stream packing.

        The host receives ONE fused payload buffer (payload words +
        per-stream bit counts, coding/stream_pack.py::fuse_packed) for the
        whole batch instead of the index/mask grids — a single D2H fetch
        per batch; each separate fetch pays a full tunnel round-trip,
        which dominated the round-2 host stage."""
        assert self._device_tables is not None
        key = (rc, rm, per_sample)
        if key not in self._encode_pack_fns:
            lens, words = self._device_tables
            max_code_len = int(lens.max()) if lens.size else 1
            mode = mode_from_ratios(rc, rm)

            def fn(v, x):
                enc = self.model.apply(v, self._to_float(x), rc, rm,
                                       per_sample=per_sample,
                                       method=CGIC.encode)
                packed = pack_streams_batch(enc.indices, enc.router.masks,
                                            enc.router.mode, lens, words,
                                            max_code_len)
                return fuse_packed(packed, mode)

            self._encode_pack_fns[key] = jax.jit(fn)
        return self._encode_pack_fns[key]

    def _pack_layout(self, mode: int, hl: int, wl: int):
        lens, _ = self._device_tables
        max_code_len = int(lens.max()) if lens.size else 1
        return fused_layout(mode, hl, wl, max_code_len)

    def _encode_packed(self, images: jnp.ndarray, rc: float, rm: float,
                       per_sample: bool) -> List[EncodedImage]:
        n, h, w, _ = images.shape
        buf = np.asarray(self._encode_pack_fn(rc, rm, per_sample)(
            self.variables, images))
        mode = mode_from_ratios(rc, rm)
        layout = self._pack_layout(mode, h // 4, w // 4)
        return [EncodedImage(mode=mode, latent_hw=(h // 4, w // 4),
                             image_hw=(h, w),
                             streams=fused_to_bytes(buf, layout, i))
                for i in range(n)]

    def streams_from_arrays(self, ind: np.ndarray, m_c: np.ndarray,
                            m_m: np.ndarray, m_f: np.ndarray, mode: int,
                            image_hw: Tuple[int, int]) -> EncodedImage:
        """Entropy-code one image's index grid + masks into a bundle.

        Per-grain streams subsample the fine grid at each grain's stride,
        then boolean-gather in row-major order (model.py:219-221)."""
        streams: Dict[str, bytes] = {}
        present = MODE_STREAMS[mode]
        if "indices_coarse" in present:
            streams["indices_coarse"] = self.huffman.encode(
                ind[::4, ::4][m_c == 1])
        if "indices_medium" in present:
            streams["indices_medium"] = self.huffman.encode(
                ind[::2, ::2][m_m == 1])
        if "indices_fine" in present:
            streams["indices_fine"] = self.huffman.encode(ind[m_f == 1])
        if "mask_coarse" in present:
            streams["mask_coarse"] = self.bitmap.encode(m_c.reshape(-1))
        if "mask_medium" in present:
            streams["mask_medium"] = self.bitmap.encode(m_m.reshape(-1))
        return EncodedImage(mode=mode, latent_hw=ind.shape,
                            image_hw=image_hw, streams=streams)

    def encode(self, image: np.ndarray, coarse_ratio: float,
               medium_ratio: float, *,
               device_pack: bool = False) -> EncodedImage:
        """image: [H, W, 3] float in the eval range [0, 1] (or [-1, 1] for
        train-convention inputs; entropy bins cover both, model.py:480).

        device_pack=True runs entropy packing on device fused with the
        encoder (byte-identical streams, no index/mask host transfer)."""
        assert image.ndim == 3, image.shape
        h, w, _ = image.shape
        assert h % 16 == 0 and w % 16 == 0, "pad/crop to /16 first"
        x = self._as_input(image)[None]
        if device_pack and self._device_tables is not None:
            return self._encode_packed(x, float(coarse_ratio),
                                       float(medium_ratio),
                                       per_sample=False)[0]
        enc = self._encode_fn(float(coarse_ratio), float(medium_ratio))(
            self.variables, x)

        # mode is trace-static (derived from the static ratios) but jit
        # returns it as a device scalar; bring it back to a Python int.
        return self.streams_from_arrays(
            np.asarray(enc.indices[0]),
            np.asarray(enc.router.mask_coarse[0]),
            np.asarray(enc.router.mask_medium[0]),
            np.asarray(enc.router.mask_fine[0]),
            int(enc.router.mode), (h, w))

    def encode_batch(self, images: np.ndarray, coarse_ratio: float,
                     medium_ratio: float, *,
                     device_pack: bool = False) -> List[EncodedImage]:
        """Batched encode of same-shape independent images/tiles. Each
        element is routed with per-sample thresholds, so the resulting
        streams are identical to encoding each image alone (the reference's
        per-tile loop, inference_high_resolution.py:235-251), but the
        device work runs as one batched program.

        device_pack=True additionally keeps stream extraction + Huffman/
        bitmap packing on device (one fused program; the host only frames
        bytes)."""
        assert images.ndim == 4, images.shape
        n, h, w, _ = images.shape
        assert h % 16 == 0 and w % 16 == 0
        if device_pack and self._device_tables is not None:
            return self._encode_packed(self._as_input(images),
                                       float(coarse_ratio),
                                       float(medium_ratio), per_sample=True)
        enc = self._encode_fn(float(coarse_ratio), float(medium_ratio),
                              per_sample=True)(
            self.variables, self._as_input(images))
        ind = np.asarray(enc.indices)
        m_c = np.asarray(enc.router.mask_coarse)
        m_m = np.asarray(enc.router.mask_medium)
        m_f = np.asarray(enc.router.mask_fine)
        mode = int(enc.router.mode)
        return [self.streams_from_arrays(ind[i], m_c[i], m_m[i], m_f[i],
                                         mode, (h, w))
                for i in range(n)]

    # ---------------------------------------------------------------- decode

    def _rebuild(self, encoded: EncodedImage
                 ) -> Tuple[np.ndarray, List[np.ndarray]]:
        """Rebuild the full index grid + mask triple from the bitstreams
        (receiver side of model.py:269-389, all 7 modes)."""
        hl, wl = encoded.latent_hw
        mode = encoded.mode
        get = lambda n: encoded.streams[n]

        def scatter(mask: np.ndarray, data: Optional[List[int]],
                    name: str = "indices") -> np.ndarray:
            grid = np.zeros(mask.shape, np.int64)
            if data is not None:
                sel = mask == 1
                if sel.sum() != len(data):
                    raise CorruptStreamError(
                        f"stream '{name}' decoded {len(data)} symbols but "
                        f"its mask selects {int(sel.sum())} positions")
                grid[sel] = np.asarray(data, np.int64)
            return grid

        zeros_c = np.zeros((hl // 4, wl // 4), np.int64)
        zeros_m = np.zeros((hl // 2, wl // 2), np.int64)
        zeros_f = np.zeros((hl, wl), np.int64)

        if mode == 0:
            m_c = np.asarray(self.bitmap.decode(get("mask_coarse")),
                             np.int64).reshape(hl // 4, wl // 4)
            m_m = np.asarray(self.bitmap.decode(get("mask_medium")),
                             np.int64).reshape(hl // 2, wl // 2)
            m_f = 1 - _up2(m_m) - _up4(m_c)
            g_c = scatter(m_c, self.huffman.decode_array(get("indices_coarse")),
                        "indices_coarse")
            g_m = scatter(m_m, self.huffman.decode_array(get("indices_medium")),
                        "indices_medium")
            g_f = scatter(m_f, self.huffman.decode_array(get("indices_fine")),
                        "indices_fine")
            ind = g_f + _up2(g_m) + _up4(g_c)
        elif mode == 1:
            m_m = np.asarray(self.bitmap.decode(get("mask_medium")),
                             np.int64).reshape(hl // 2, wl // 2)
            m_f = 1 - _up2(m_m)
            m_c = zeros_c
            g_m = scatter(m_m, self.huffman.decode_array(get("indices_medium")),
                        "indices_medium")
            g_f = scatter(m_f, self.huffman.decode_array(get("indices_fine")),
                        "indices_fine")
            ind = g_f + _up2(g_m)
        elif mode == 2:
            m_c = np.asarray(self.bitmap.decode(get("mask_coarse")),
                             np.int64).reshape(hl // 4, wl // 4)
            m_f = 1 - _up4(m_c)
            m_m = zeros_m
            g_c = scatter(m_c, self.huffman.decode_array(get("indices_coarse")),
                        "indices_coarse")
            g_f = scatter(m_f, self.huffman.decode_array(get("indices_fine")),
                        "indices_fine")
            ind = g_f + _up4(g_c)
        elif mode == 3:
            m_c = np.asarray(self.bitmap.decode(get("mask_coarse")),
                             np.int64).reshape(hl // 4, wl // 4)
            m_m = 1 - _up2(m_c)
            m_f = zeros_f
            g_c = scatter(m_c, self.huffman.decode_array(get("indices_coarse")),
                        "indices_coarse")
            g_m = scatter(m_m, self.huffman.decode_array(get("indices_medium")),
                        "indices_medium")
            ind = _up4(g_c) + _up2(g_m)
        elif mode == 4:
            data = self.huffman.decode_array(get("indices_coarse"))
            ind = _up4(np.asarray(data, np.int64).reshape(hl // 4, wl // 4))
            m_c = np.ones_like(zeros_c)
            m_m, m_f = zeros_m, zeros_f
        elif mode == 5:
            data = self.huffman.decode_array(get("indices_medium"))
            ind = _up2(np.asarray(data, np.int64).reshape(hl // 2, wl // 2))
            m_m = np.ones_like(zeros_m)
            m_c, m_f = zeros_c, zeros_f
        elif mode == 6:
            data = self.huffman.decode_array(get("indices_fine"))
            ind = np.asarray(data, np.int64).reshape(hl, wl)
            m_f = np.ones_like(zeros_f)
            m_c, m_m = zeros_c, zeros_m
        else:
            raise ValueError(f"bad mode {mode}")

        return ind, [m_c, m_m, m_f]

    def decode(self, encoded: EncodedImage) -> np.ndarray:
        """-> [H, W, 3] float reconstruction."""
        return self.decode_batch([encoded])[0]

    def decode_batch(self, encoded: List[EncodedImage], *,
                     out_uint8: bool = False,
                     device_unpack: bool = False,
                     strict: bool = False) -> np.ndarray:
        """Batched decode of same-shape bundles -> [N, H, W, 3] (float, or
        save_png-quantized uint8 with out_uint8=True).

        device_unpack=True runs the whole receiver on device (parallel
        Huffman decode + mask/grid rebuild): the H2D upload is the raw
        compressed bitstreams instead of the decoded index/mask grids.
        Pixel-identical to the host path (pinned by test_device_unpack);
        requires a device-decodable table (falls back to host otherwise —
        strict=True raises instead, for callers that need the device
        path's guarantees). The host path additionally VALIDATES streams
        (CorruptStreamError); the device path assumes well-formed input.
        After the call, self.last_decode_path records which receiver ran
        ('device' or 'host') for programmatic callers."""
        engaged = device_unpack and self._decode_tables is not None
        if device_unpack and not engaged and strict:
            raise ValueError(
                "device_unpack requested with strict=True but this codec's "
                "Huffman table is not device-decodable (code lengths "
                "outside [1, MAX_LUT_BITS])")
        self.last_decode_path = "device" if engaged else "host"
        if engaged:
            return np.asarray(self.decode_batch_device_async(
                encoded, out_uint8=out_uint8))
        return np.asarray(self.decode_batch_async(encoded,
                                                  out_uint8=out_uint8))

    def decode_batch_device_async(self, encoded: List[EncodedImage], *,
                                  out_uint8: bool = False,
                                  stats: Optional[dict] = None
                                  ) -> jnp.ndarray:
        """Device-unpack receiver: flat bitstream upload + async decode
        dispatch (see decode_batch). Returns the device array."""
        mode, (hl, wl) = encoded[0].mode, encoded[0].latent_hw
        assert all(e.mode == mode and e.latent_hw == (hl, wl)
                   for e in encoded)
        t0 = time.perf_counter()
        flat, offs = self._flat_stream_upload(encoded)
        t1 = time.perf_counter()
        lut_s, lut_l = self._decode_luts_on_device()
        out = self._decode_unpack_fn(mode, hl, wl, out_uint8)(
            self.variables, jnp.asarray(flat), jnp.asarray(offs),
            lut_s, lut_l)
        _acc(stats, "b_rebuild_s", t1 - t0)
        _acc(stats, "b_h2d_dispatch_s", time.perf_counter() - t1)
        _acc(stats, "b_h2d_bytes", flat.nbytes + offs.nbytes)
        return out

    # ----------------------------------------------------- pipelined batches

    def encode_batch_async(self, images: np.ndarray, coarse_ratio: float,
                           medium_ratio: float, *,
                           device_pack: bool = False) -> "_PendingEncode":
        """Dispatch the device half of encode_batch and return immediately.

        JAX execution is asynchronous: the returned handle owns device
        arrays that are still being computed. encode_finish() blocks on
        them and runs the host framing. Between the two calls the host is
        free to run another batch's entropy stage — see
        roundtrip_pipelined()."""
        assert images.ndim == 4, images.shape
        n, h, w, _ = images.shape
        assert h % 16 == 0 and w % 16 == 0
        x = self._as_input(images)
        mode = mode_from_ratios(coarse_ratio, medium_ratio)
        if device_pack and self._device_tables is not None:
            out = self._encode_pack_fn(float(coarse_ratio),
                                       float(medium_ratio),
                                       per_sample=True)(self.variables, x)
            try:  # schedule the packed-words D2H as soon as encode lands
                out.copy_to_host_async()
            except AttributeError:
                pass
            return _PendingEncode(mode, (h // 4, w // 4), (h, w), n,
                                  packed=out)
        enc = self._encode_fn(float(coarse_ratio), float(medium_ratio),
                              per_sample=True)(self.variables, x)
        return _PendingEncode(mode, (h // 4, w // 4), (h, w), n, enc=enc)

    def encode_finish(self, pending: "_PendingEncode",
                      stats: Optional[dict] = None) -> List[EncodedImage]:
        """Fetch a pending encode's device arrays and frame the bitstreams
        (the host entropy stage). Blocks until the device work is done.

        stats (optional dict) accumulates per-stage seconds/bytes for
        self-attributing benchmarks: 'b_sync_s' (wait for the device encode
        to finish computing), 'b_fetch_s' (packed-words D2H wire),
        'b_frame_s' (host byte framing), 'b_fetch_bytes'. The sync/fetch
        split separates "encode was slow" from "tunnel was slow" in bench
        diagnostics."""
        if pending.packed is not None:
            t0 = time.perf_counter()
            try:
                pending.packed.block_until_ready()
            except AttributeError:
                pass
            t1 = time.perf_counter()
            buf = np.asarray(pending.packed)
            t2 = time.perf_counter()
            layout = self._pack_layout(pending.mode, *pending.latent_hw)
            out = [EncodedImage(mode=pending.mode,
                                latent_hw=pending.latent_hw,
                                image_hw=pending.image_hw,
                                streams=fused_to_bytes(buf, layout, i))
                   for i in range(pending.n)]
            _acc(stats, "b_sync_s", t1 - t0)
            _acc(stats, "b_fetch_s", t2 - t1)
            _acc(stats, "b_frame_s", time.perf_counter() - t2)
            _acc(stats, "b_fetch_bytes", buf.nbytes)
            return out
        enc = pending.enc
        ind = np.asarray(enc.indices)
        m_c = np.asarray(enc.router.mask_coarse)
        m_m = np.asarray(enc.router.mask_medium)
        m_f = np.asarray(enc.router.mask_fine)
        return [self.streams_from_arrays(ind[i], m_c[i], m_m[i], m_f[i],
                                         pending.mode, pending.image_hw)
                for i in range(pending.n)]

    def decode_batch_async(self, encoded: List[EncodedImage], *,
                           out_uint8: bool = False,
                           stats: Optional[dict] = None) -> jnp.ndarray:
        """Host receiver rebuild + async device decode dispatch. Returns the
        (possibly still computing) device array; np.asarray() it to sync.

        stats accumulates 'b_rebuild_s' (host entropy decode + grid
        rebuild), 'b_h2d_dispatch_s', 'b_h2d_bytes'."""
        t0 = time.perf_counter()
        mode, (hl, wl) = encoded[0].mode, encoded[0].latent_hw
        # the compact buffer derives every image's masks from ONE static
        # mode — a mixed-mode batch would decode silently wrong
        assert all(e.mode == mode and e.latent_hw == (hl, wl)
                   for e in encoded), "decode_batch needs same-mode/"\
            "same-shape bundles; split mixed batches by (mode, latent_hw)"
        inds = [self._rebuild(e)[0] for e in encoded]
        buf = self._compact_decode_input(encoded, inds)
        t1 = time.perf_counter()
        out = self._decode_fused_fn(mode, hl, wl, out_uint8)(
            self.variables, jnp.asarray(buf))
        _acc(stats, "b_rebuild_s", t1 - t0)
        _acc(stats, "b_h2d_dispatch_s", time.perf_counter() - t1)
        _acc(stats, "b_h2d_bytes", buf.nbytes)
        return out

    def roundtrip_pipelined(self, batches, coarse_ratio: float,
                            medium_ratio: float, *,
                            device_pack: bool = False,
                            out_uint8: bool = False,
                            device_unpack: bool = False,
                            threads: Optional[bool] = None
                            ) -> Tuple[List[np.ndarray],
                                       List[List[EncodedImage]]]:
        """Software-pipelined full codec over a sequence of same-shape image
        batches: while the host runs batch i's entropy stage (frame bytes ->
        receiver rebuild), the device is already executing batch i+1's
        encode, and batch i-1's decode drains in the background. Results are
        identical to calling encode_batch/decode_batch per batch (pinned by
        test_codec); only the schedule differs.

        threads=None: auto (threaded on accelerator backends). The threaded
        schedule runs the three wire legs — H2D image upload, D2H packed
        words + host entropy stage, D2H reconstruction fetch — on separate
        threads with bounded hand-off queues, so upload, device compute and
        the two download streams overlap. On a remote-tunnel-attached chip
        (~30 MB/s, ~25 ms/round-trip) the wire IS the critical path and
        this overlap is the difference between serial and full-duplex
        throughput.

        After the call, self.last_pipeline_stats holds per-stage cumulative
        seconds + byte counts (a_upload_s, b_fetch_s, b_frame_s,
        b_rebuild_s, b_h2d_dispatch_s, c_fetch_s, wall_s, ...): the
        self-attribution record for benchmark runs — the stage sums vs
        wall_s say how much overlap actually engaged.

        Returns (reconstructions per batch, bundles per batch)."""
        import jax as _jax
        batches = list(batches)
        if threads is None:
            threads = _jax.default_backend() != "cpu"
        if threads and len(batches) > 1:
            return self._roundtrip_threaded(batches, coarse_ratio,
                                            medium_ratio,
                                            device_pack=device_pack,
                                            out_uint8=out_uint8,
                                            device_unpack=device_unpack)
        engaged = device_unpack and self._decode_tables is not None
        dec_async = (self.decode_batch_device_async if engaged
                     else self.decode_batch_async)
        stats = defaultdict(float)
        stats["device_unpack"] = float(engaged)
        t_wall = time.perf_counter()
        recs: List[np.ndarray] = []
        encs_all: List[List[EncodedImage]] = []

        def fetch_rec(pend):
            t0 = time.perf_counter()
            try:
                pend.block_until_ready()
            except AttributeError:
                pass
            t1 = time.perf_counter()
            recs.append(np.asarray(pend))
            stats["c_sync_s"] += t1 - t0
            stats["c_fetch_s"] += time.perf_counter() - t1

        pend_d = None
        pend_e = (self.encode_batch_async(batches[0], coarse_ratio,
                                          medium_ratio,
                                          device_pack=device_pack)
                  if batches else None)
        for i in range(len(batches)):
            t0 = time.perf_counter()
            nxt = (self.encode_batch_async(batches[i + 1], coarse_ratio,
                                           medium_ratio,
                                           device_pack=device_pack)
                   if i + 1 < len(batches) else None)
            stats["a_upload_s"] += time.perf_counter() - t0
            encs = self.encode_finish(pend_e, stats=stats)
            encs_all.append(encs)
            if pend_d is not None:
                fetch_rec(pend_d)
            pend_d = dec_async(encs, out_uint8=out_uint8, stats=stats)
            pend_e = nxt
        if pend_d is not None:
            fetch_rec(pend_d)
        stats["wall_s"] = time.perf_counter() - t_wall
        stats["threaded"] = 0.0
        self.last_pipeline_stats = dict(stats)
        return recs, encs_all

    def _roundtrip_threaded(self, batches, coarse_ratio: float,
                            medium_ratio: float, *, device_pack: bool,
                            out_uint8: bool, device_unpack: bool = False):
        """Three-thread pipeline (see roundtrip_pipelined): main thread
        uploads+dispatches encodes, worker B fetches packed words / runs the
        host entropy stage / dispatches decodes, worker C fetches
        reconstructions. Queues are bounded so at most ~2 batches per stage
        are in flight (backpressure bounds device memory)."""
        import queue
        import threading

        n = len(batches)
        engaged = device_unpack and self._decode_tables is not None
        dec_async = (self.decode_batch_device_async if engaged
                     else self.decode_batch_async)
        recs: List[Optional[np.ndarray]] = [None] * n
        encs_all: List[Optional[List[EncodedImage]]] = [None] * n
        qa: "queue.Queue" = queue.Queue(maxsize=2)
        qb: "queue.Queue" = queue.Queue(maxsize=2)
        errors: List[BaseException] = []
        stats = defaultdict(float)
        stats["device_unpack"] = float(engaged)
        t_wall = time.perf_counter()

        # Workers record the first error and keep draining their queues so
        # no producer ever blocks on a full queue against a dead consumer.
        def worker_b():
            while True:
                item = qa.get()
                if item is None:
                    qb.put(None)
                    return
                if errors:
                    continue
                i, pend = item
                try:
                    encs = self.encode_finish(pend, stats=stats)
                    rec_dev = dec_async(encs, out_uint8=out_uint8,
                                        stats=stats)
                    try:  # start the D2H as soon as the decode finishes
                        rec_dev.copy_to_host_async()
                    except AttributeError:
                        pass
                    qb.put((i, encs, rec_dev))
                except BaseException as e:  # propagate to main
                    errors.append(e)

        def worker_c():
            while True:
                item = qb.get()
                if item is None:
                    return
                if errors:
                    continue
                i, encs, rec_dev = item
                try:
                    encs_all[i] = encs
                    t0 = time.perf_counter()
                    try:
                        rec_dev.block_until_ready()
                    except AttributeError:
                        pass
                    t1 = time.perf_counter()
                    recs[i] = np.asarray(rec_dev)
                    stats["c_sync_s"] += t1 - t0
                    stats["c_fetch_s"] += time.perf_counter() - t1
                except BaseException as e:
                    errors.append(e)

        tb = threading.Thread(target=worker_b, daemon=True)
        tc = threading.Thread(target=worker_c, daemon=True)
        tb.start()
        tc.start()
        for i in range(n):
            if errors:
                break
            t0 = time.perf_counter()
            pend = self.encode_batch_async(batches[i], coarse_ratio,
                                           medium_ratio,
                                           device_pack=device_pack)
            stats["a_upload_s"] += time.perf_counter() - t0
            stats["a_upload_bytes"] += getattr(batches[i], "nbytes", 0)
            qa.put((i, pend))
        qa.put(None)
        tb.join()
        tc.join()
        stats["wall_s"] = time.perf_counter() - t_wall
        stats["threaded"] = 1.0
        self.last_pipeline_stats = dict(stats)
        if errors:
            raise errors[0]
        return recs, encs_all

    # ------------------------------------------------------------ round-trip

    def compress(self, image: np.ndarray, coarse_ratio: float,
                 medium_ratio: float, out_dir: Optional[str] = None,
                 device_pack: bool = False
                 ) -> Tuple[np.ndarray, float, EncodedImage]:
        """Full sender->receiver round-trip (through files when out_dir is
        given, exactly like the reference compress(), model.py:206-401).

        Returns (reconstruction [H,W,3], bpp, encoded bundle)."""
        encoded = self.encode(image, coarse_ratio, medium_ratio,
                              device_pack=device_pack)
        if out_dir is not None:
            encoded.write(out_dir)
            encoded = EncodedImage.read(out_dir, encoded.mode,
                                        encoded.latent_hw, encoded.image_hw)
        rec = self.decode(encoded)
        return rec, encoded.bpp, encoded
