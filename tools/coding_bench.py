"""Entropy-codec throughput: encode/decode MB/s and symbols/s, host side.

Measures the C++ extension (coding/native/entropy_codec.cpp) and the
pure-Python fallback on realistic stream sizes:
  - 256px image:  4096-position fine grid, ~3k symbols/stream
  - Kodak 768x512: 24,576 fine positions
  - DIV2K 2K tile sweep: 6x 768px tiles -> ~221k symbols total
Symbols drawn from a Zipf-ish distribution over the 1024-code codebook (the
trained counter tables are heavy-tailed), so code lengths are realistic.

Answers VERDICT.md round-1 item 8: is receiver-side Huffman decode the
bottleneck at DIV2K scale next to the neural decode (~tens of ms)?
Results recorded in docs/STATUS.md + docs/DESIGN.md.

python tools/coding_bench.py    (no jax; pure host)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from control_gic_tpu.coding import HuffmanCodec
from control_gic_tpu.coding.native_lib import get_native


def zipf_counts(n_sym: int, rng) -> np.ndarray:
    ranks = np.arange(1, n_sym + 1)
    c = (1e7 / ranks ** 1.2).astype(np.int64)
    return np.maximum(rng.permutation(c), 1)


def bench(codec: HuffmanCodec, syms: np.ndarray, reps: int, native: bool):
    codec._native = get_native() if native else None
    enc = codec.encode(syms)
    t0 = time.perf_counter()
    for _ in range(reps):
        enc = codec.encode(syms)
    t_enc = (time.perf_counter() - t0) / reps
    dec = codec.decode_array(enc)   # the receiver hot path (codec.py)
    t0 = time.perf_counter()
    for _ in range(reps):
        dec = codec.decode_array(enc)
    t_dec = (time.perf_counter() - t0) / reps
    assert np.array_equal(dec, syms)
    assert codec.decode(enc) == syms.tolist()  # list contract still holds
    mb = len(enc) / 1e6
    return (len(enc), mb / t_enc, mb / t_dec,
            syms.size / t_enc / 1e6, syms.size / t_dec / 1e6,
            t_enc * 1e3, t_dec * 1e3)


def main():
    rng = np.random.default_rng(0)
    counts = zipf_counts(1024, rng)
    codec = HuffmanCodec.from_counts(counts)
    p = counts / counts.sum()

    sizes = {
        "256px_fine": 4096,
        "kodak_fine": 24576,
        "div2k_6tiles": 6 * 36864,
    }
    print(f"{'stream':>14} {'syms':>8} {'bytes':>8} "
          f"{'enc MB/s':>9} {'dec MB/s':>9} {'enc Msym/s':>10} "
          f"{'dec Msym/s':>10} {'dec ms':>8}")
    for name, n in sizes.items():
        syms = rng.choice(1024, size=n, p=p).astype(np.int32)
        for native in (True, False):
            if not native and n > 50000:
                reps = 2
            else:
                reps = 20 if native else 5
            nb, embs, dmbs, esps, dsps, tenc, tdec = bench(
                codec, syms, reps, native)
            label = name + ("/c++" if native else "/py")
            print(f"{label:>14} {n:>8} {nb:>8} {embs:>9.1f} {dmbs:>9.1f} "
                  f"{esps:>10.2f} {dsps:>10.2f} {tdec:>8.3f}")
    codec._native = get_native()


if __name__ == "__main__":
    main()
