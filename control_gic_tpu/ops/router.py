"""Triple-grain entropy router: pure function, no parameters.

Given the two entropy maps and a static (coarse, medium, fine) ratio triple,
selects per-region granularity by global entropy thresholding. The behavioral
contract replicates /root/reference/CGIC/modules/vqvae/RouterTriple.py:15-95
exactly, including:
  - thresholds computed over the batch-flattened entropy map (jnp.sort asc),
  - k = round(N * ratio) with Python banker's rounding (ratios are static
    config, so k is resolved at trace time),
  - threshold value sorted[k-1] (or sorted[0] when k == 0),
  - strict `<` comparisons (ties at the threshold routed to the finer grain),
  - the medium threshold index k = round(4*N16*r_c + N8*r_m) compensating for
    the entropy-zeroed already-coarse area,
  - 7 compression modes 0-6 keyed by which ratios are zero; the mode is a
    static Python int so stream handling downstream is trace-static.

Unlike the reference (which concatenates gates along width, yielding a
malformed partition map — see SURVEY.md §2.4.1), `grain_indices_from_masks`
returns the correct [B, 64, 64] map with 0=coarse, 1=medium, 2=fine.

TPU notes: the sort is O(N log N) over <=B*1024 f32 values — negligible; all
masks are dense int32 grids, so downstream gating is dense multiplies that
XLA fuses into neighbors. Mode dispatch is Python-level, so each compiled
program contains exactly one branch.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .resample import upsample_nearest


class RouterOutput(NamedTuple):
    mask_coarse: jnp.ndarray   # [B, H16, W16] int32 (1 = coarse here)
    mask_medium: jnp.ndarray   # [B, H8,  W8 ] int32
    mask_fine: jnp.ndarray     # [B, H4,  W4 ] int32
    mode: int                  # static compression mode 0..6

    @property
    def masks(self) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        return (self.mask_coarse, self.mask_medium, self.mask_fine)


def mode_from_ratios(coarse_ratio: float, medium_ratio: float) -> int:
    """Static compression mode 0-6 from the ratio triple
    (RouterTriple.py:18-91 dispatch; fine = 1 - c - m)."""
    c, m = float(coarse_ratio), float(medium_ratio)
    f = max(1.0 - c - m, 0.0)   # same clamp as triple_grain_router
    zeros = (c == 0, m == 0, f == 0)
    if sum(zeros) == 0:
        return 0
    if sum(zeros) == 1:
        return 1 if zeros[0] else (2 if zeros[1] else 3)
    return 4 if c != 0 else (5 if m != 0 else 6)


def triple_grain_router(e16: jnp.ndarray, e8: jnp.ndarray,
                        coarse_ratio: float, medium_ratio: float,
                        per_sample: bool = False) -> RouterOutput:
    """Route each region to a granularity by global entropy thresholds.

    Args:
      e16: [B, H16, W16] entropy of 16px patches (coarse candidates).
      e8:  [B, H8, W8] entropy of 8px patches (medium candidates), H8 = 2*H16.
      coarse_ratio, medium_ratio: static Python floats; fine = 1 - c - m.
      per_sample: False (default) computes thresholds over the
        batch-flattened maps, matching the reference exactly (which only
        ever sees B=1 at inference). True computes thresholds per batch
        element — required when batching independent images/tiles (each
        tile must behave as if compressed alone, like the reference's
        per-tile loop in inference_high_resolution.py:235-251).
    """
    coarse_ratio = float(coarse_ratio)
    medium_ratio = float(medium_ratio)
    fine_ratio = 1.0 - coarse_ratio - medium_ratio
    if not (0.0 <= coarse_ratio <= 1.0 and 0.0 <= medium_ratio <= 1.0
            and fine_ratio >= -1e-9):
        raise ValueError(
            f"invalid grain ratios: coarse={coarse_ratio} "
            f"medium={medium_ratio} (fine = 1 - c - m = {fine_ratio}); "
            "each must be in [0, 1] and sum to at most 1")
    fine_ratio = max(fine_ratio, 0.0)

    b, h16, w16 = e16.shape
    _, h8, w8 = e8.shape
    assert (h8, w8) == (2 * h16, 2 * w16), (e16.shape, e8.shape)
    nb = 1 if per_sample else b
    n16 = nb * h16 * w16
    n8 = nb * h8 * w8

    e16 = e16.astype(jnp.float32)
    e8 = e8.astype(jnp.float32)

    def _threshold(vals: jnp.ndarray, k: int) -> jnp.ndarray:
        """kth-smallest (sorted[k-1], reference's k==0 fallback to
        sorted[0]) over the flattened map — global or per sample.
        Returns a broadcastable [B?,1,1] threshold."""
        idx = k - 1 if k != 0 else 0
        if per_sample:
            s = jnp.sort(vals.reshape(b, -1), axis=-1)
            return s[:, idx][:, None, None]
        return jnp.sort(vals.reshape(-1))[idx]

    num_zero = int(fine_ratio == 0) + int(medium_ratio == 0) + int(coarse_ratio == 0)

    if num_zero == 0:
        mode = 0
        k_c = round(n16 * coarse_ratio)
        thr_c = _threshold(e16, k_c)
        gate_c = e16 < thr_c                                        # [B,16,16]
        not_c = ~upsample_nearest(gate_c, 2)                        # [B,32,32]
        e8_masked = e8 * not_c.astype(jnp.float32)
        k_m = round(4 * n16 * coarse_ratio + n8 * medium_ratio)
        thr_m = _threshold(e8_masked, k_m)
        gate_m = (e8 < thr_m) & not_c
        gate_f = ~(upsample_nearest(gate_c, 4) | upsample_nearest(gate_m, 2))
    elif num_zero == 1:
        if coarse_ratio == 0:
            mode = 1
            k_m = round(n8 * medium_ratio)
            thr_m = _threshold(e8, k_m)
            gate_m = e8 < thr_m
            gate_f = ~upsample_nearest(gate_m, 2)
            gate_c = jnp.zeros((b, h16, w16), dtype=bool)
        elif medium_ratio == 0:
            mode = 2
            k_c = round(n16 * coarse_ratio)
            thr_c = _threshold(e16, k_c)
            gate_c = e16 < thr_c
            gate_f = ~upsample_nearest(gate_c, 4)
            gate_m = jnp.zeros((b, h8, w8), dtype=bool)
        else:  # fine_ratio == 0
            mode = 3
            k_c = round(n16 * coarse_ratio)
            thr_c = _threshold(e16, k_c)
            gate_c = e16 < thr_c
            gate_m = ~upsample_nearest(gate_c, 2)
            gate_f = jnp.zeros((b, 2 * h8, 2 * w8), dtype=bool)
    else:  # exactly one nonzero ratio
        if coarse_ratio != 0:
            mode = 4
            gate_c = jnp.ones((b, h16, w16), dtype=bool)
            gate_m = jnp.zeros((b, h8, w8), dtype=bool)
            gate_f = jnp.zeros((b, 2 * h8, 2 * w8), dtype=bool)
        elif medium_ratio != 0:
            mode = 5
            gate_c = jnp.zeros((b, h16, w16), dtype=bool)
            gate_m = jnp.ones((b, h8, w8), dtype=bool)
            gate_f = jnp.zeros((b, 2 * h8, 2 * w8), dtype=bool)
        else:
            mode = 6
            gate_c = jnp.zeros((b, h16, w16), dtype=bool)
            gate_m = jnp.zeros((b, h8, w8), dtype=bool)
            gate_f = jnp.ones((b, 2 * h8, 2 * w8), dtype=bool)

    return RouterOutput(
        mask_coarse=gate_c.astype(jnp.int32),
        mask_medium=gate_m.astype(jnp.int32),
        mask_fine=gate_f.astype(jnp.int32),
        mode=mode,
    )


def grain_indices_from_masks(out: RouterOutput) -> jnp.ndarray:
    """Partition map on the fine grid: 0 = coarse, 1 = medium, 2 = fine.

    (The reference's `indices` output is malformed — gates concatenated along
    width, RouterTriple.py:94 — so we compute the map from the masks, which
    are the authoritative routing.)
    """
    up_m = upsample_nearest(out.mask_medium, 2)
    return (1 * up_m + 2 * out.mask_fine).astype(jnp.int32)
