"""Fully on-device batched stream extraction + entropy packing.

The reference extracts per-grain index streams with boolean gathers on host
(model.py:219-221) and then packs bits in Python — two device->host syncs
plus O(bits) host work per image. Here the whole sender-side pipeline after
the neural encoder stays on device and jit-fuses with it:

  1. subsample the fine index grid at each grain's stride,
  2. front-compact the masked symbols in row-major order (stable argsort on
     the inverted mask — a parallel compaction; the stream order is exactly
     the reference's boolean-gather order),
  3. Huffman-pack every stream with the parallel-prefix packer
     (huffman_tpu.huffman_pack_bits), masks included: a bitmap is just a
     "Huffman" table {0:'0', 1:'1'} (mask_coding.py:14-38), so the same
     kernel emits byte-identical mask frames,
  4. ship ONLY the packed words + bit counts to host; framing is a byte
     slice (frame_from_words).

Ragged stream lengths stay shape-static via fixed per-grain capacities
(the full subsampled grid) + validity counts. The emitted frames are
byte-identical to HuffmanCodec/BitmapCodec output for the same tables.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .huffman_tpu import frame_from_words, huffman_pack_bits

# Streams required per compression mode (model.py:225-260); mirrors
# codec.MODE_STREAMS but lives here to keep the module import-light.
_MODE_STREAMS = {
    0: ("indices_coarse", "indices_medium", "indices_fine",
        "mask_coarse", "mask_medium"),
    1: ("indices_medium", "indices_fine", "mask_medium"),
    2: ("indices_coarse", "indices_fine", "mask_coarse"),
    3: ("indices_coarse", "indices_medium", "mask_coarse"),
    4: ("indices_coarse",),
    5: ("indices_medium",),
    6: ("indices_fine",),
}

# The bitmap "code table": symbol 0 -> bit 0, symbol 1 -> bit 1.
_BITMAP_LENS = np.ones(2, np.int32)
_BITMAP_WORDS = np.arange(2, dtype=np.uint32)


def compact_masked(values: jnp.ndarray, mask: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Front-pack values[..., mask==1] in row-major order.

    values/mask: [..., N] (leading dims batched). Returns (compacted
    [..., N] with the selected symbols first, count [...] int32). Stable
    argsort keeps the original order among the selected elements, matching
    numpy boolean-gather order.
    """
    keep = mask.astype(jnp.int32)
    order = jnp.argsort(1 - keep, axis=-1, stable=True)
    compacted = jnp.take_along_axis(values, order, axis=-1)
    return compacted, keep.sum(axis=-1).astype(jnp.int32)


def _pack(symbols: jnp.ndarray, count: jnp.ndarray, lens: jnp.ndarray,
          words: jnp.ndarray, max_words: int):
    """Batched parallel-prefix pack: symbols [B, N], count [B]."""
    import jax
    fn = lambda s, c: huffman_pack_bits(s, c, lens, words, max_words)
    return jax.vmap(fn)(symbols, count)


def pack_streams_batch(ind: jnp.ndarray, masks, mode: int,
                       lens: np.ndarray, words: np.ndarray,
                       max_code_len: int
                       ) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Device-side sender: index grid + masks -> packed stream words.

    Args:
      ind: [B, Hl, Wl] int32 fine-grid codebook indices.
      masks: (mask_coarse [B,Hl/4,Wl/4], mask_medium [B,Hl/2,Wl/2],
              mask_fine [B,Hl,Wl]) int grids.
      mode: static compression mode 0..6.
      lens/words: Huffman code tables (huffman_tpu.pack_tables), max code
        length <= 32 (callers gate on supports_table).
      max_code_len: static int(lens.max()) — must be passed statically
        because under jit the table arrays trace as captured constants.

    Returns {stream_name: (payload_words [B, max_words] uint32,
                           total_bits [B] int32)}; only the streams the
    mode transmits are present. jit-safe (mode/capacities static).
    """
    m_c, m_m, m_f = masks
    b = ind.shape[0]
    lens = jnp.asarray(lens, jnp.int32)
    words = jnp.asarray(words, jnp.uint32)
    max_len = max(int(max_code_len), 1)
    present = _MODE_STREAMS[mode]
    out: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}

    def index_stream(grid: jnp.ndarray, mask):
        sym = grid.reshape(b, -1).astype(jnp.int32)
        n = sym.shape[-1]
        if mask is None:   # modes 4/5/6: the whole grid is one stream
            count = jnp.full((b,), n, jnp.int32)
        else:
            sym, count = compact_masked(sym, mask.reshape(b, -1))
        mw = (n * max_len + 31) // 32 + 1
        return _pack(sym, count, lens, words, mw)

    def bitmap_stream(mask: jnp.ndarray):
        sym = mask.reshape(b, -1).astype(jnp.int32)
        n = sym.shape[-1]
        mw = (n + 31) // 32 + 1
        return _pack(sym, jnp.full((b,), n, jnp.int32),
                     jnp.asarray(_BITMAP_LENS), jnp.asarray(_BITMAP_WORDS),
                     mw)

    if "indices_coarse" in present:
        out["indices_coarse"] = index_stream(
            ind[:, ::4, ::4], m_c if mode != 4 else None)
    if "indices_medium" in present:
        out["indices_medium"] = index_stream(
            ind[:, ::2, ::2], m_m if mode != 5 else None)
    if "indices_fine" in present:
        out["indices_fine"] = index_stream(ind, m_f if mode != 6 else None)
    if "mask_coarse" in present:
        out["mask_coarse"] = bitmap_stream(m_c)
    if "mask_medium" in present:
        out["mask_medium"] = bitmap_stream(m_m)
    return out


def streams_to_bytes(packed: Dict[str, Tuple[np.ndarray, np.ndarray]],
                     i: int) -> Dict[str, bytes]:
    """Frame image i's streams from fetched (payload, bits) arrays."""
    return {name: frame_from_words(np.asarray(p[i]), int(bits[i]))
            for name, (p, bits) in packed.items()}


# --------------------------------------------------- fused single-fetch form

def fused_layout(mode: int, hl: int, wl: int, max_code_len: int):
    """Static word layout of the fused payload buffer for one mode:
    [(stream_name, word_offset, n_words), ...] in _MODE_STREAMS order.

    Capacities mirror pack_streams_batch exactly (index streams:
    ceil(n * max_code_len / 32) + 1; bitmaps: ceil(n / 32) + 1)."""
    max_len = max(int(max_code_len), 1)
    sizes = {
        "indices_coarse": ((hl // 4) * (wl // 4) * max_len + 31) // 32 + 1,
        "indices_medium": ((hl // 2) * (wl // 2) * max_len + 31) // 32 + 1,
        "indices_fine": (hl * wl * max_len + 31) // 32 + 1,
        "mask_coarse": ((hl // 4) * (wl // 4) + 31) // 32 + 1,
        "mask_medium": ((hl // 2) * (wl // 2) + 31) // 32 + 1,
    }
    out = []
    off = 0
    for name in _MODE_STREAMS[mode]:
        out.append((name, off, sizes[name]))
        off += sizes[name]
    return out


def fuse_packed(packed: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]],
                mode: int) -> jnp.ndarray:
    """Concatenate pack_streams_batch output into ONE uint32 buffer
    [B, total_words + n_streams]: every stream's payload words, then one
    tail word per stream holding its total bit count. The host needs
    exactly ONE D2H fetch per batch (each fetch pays a full tunnel
    round-trip, which dominates on a remote-attached chip)."""
    names = [n for n in _MODE_STREAMS[mode]]
    bits = jnp.stack([packed[n][1].astype(jnp.uint32) for n in names],
                     axis=-1)
    return jnp.concatenate([packed[n][0] for n in names] + [bits], axis=-1)


def fused_to_bytes(buf: np.ndarray, layout, i: int) -> Dict[str, bytes]:
    """Frame image i's streams from the fetched fused buffer (payload
    words + per-stream bit-count tail, see fuse_packed)."""
    total = layout[-1][1] + layout[-1][2]
    return {name: frame_from_words(buf[i, off:off + nw],
                                   int(buf[i, total + k]))
            for k, (name, off, nw) in enumerate(layout)}
