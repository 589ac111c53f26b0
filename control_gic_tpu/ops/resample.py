"""Spatial resampling primitives, NHWC layout.

Semantics match the reference codec's resamplers exactly (see
/root/reference/CGIC/modules/vqvae/decoder.py:48,70-74,304-305 and
RouterTriple.py:16-17): "nearest" interpolation uses the floor rule
src = (dst * in_size) // out_size, identical to torch's nearest mode for
both up- and down-scaling; average pooling is non-overlapping.

All functions are jit-friendly (static output sizes) and work on arrays of
rank >= 2 where the spatial dims are given by `axis_h`/`axis_w` (default:
dims 1 and 2, i.e. NHWC or NHW).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax


def nearest_resize(x: jnp.ndarray, out_h: int, out_w: int,
                   axis_h: int = 1, axis_w: int = 2) -> jnp.ndarray:
    """Nearest-neighbor resize with torch's floor index rule."""
    in_h = x.shape[axis_h]
    in_w = x.shape[axis_w]
    if in_h == out_h and in_w == out_w:
        return x
    idx_h = (jnp.arange(out_h) * in_h) // out_h
    idx_w = (jnp.arange(out_w) * in_w) // out_w
    x = jnp.take(x, idx_h, axis=axis_h)
    x = jnp.take(x, idx_w, axis=axis_w)
    return x


def upsample_nearest(x: jnp.ndarray, scale: int,
                     axis_h: int = 1, axis_w: int = 2) -> jnp.ndarray:
    """Integer-factor nearest upsample (repeat each pixel `scale` times)."""
    if scale == 1:
        return x
    x = jnp.repeat(x, scale, axis=axis_h)
    x = jnp.repeat(x, scale, axis=axis_w)
    return x


def subpixel_enabled() -> bool:
    """Gate for the subpixel upsample+conv reformulation (default ON — it is
    the same math on plain XLA ops, just 4/9 the FLOPs; CONTROL_GIC_SUBPIXEL=0
    restores the direct nearest-up2 -> 3x3 conv composition)."""
    return os.environ.get("CONTROL_GIC_SUBPIXEL", "1") != "0"


# Row/col aliasing of a SAME 3x3 conv on a x2-nearest-upsampled grid: output
# row 2i+a reads upsampled rows 2i+a-1..2i+a+1, which floor-divide onto low-
# res rows {i-1, i} (a=0, weights W0 | W1+W2) or {i, i+1} (a=1, W0+W1 | W2).
_PHASE = (
    ((1.0, 0.0, 0.0), (0.0, 1.0, 1.0)),   # a=0: taps (i-1, i)
    ((1.0, 1.0, 0.0), (0.0, 0.0, 1.0)),   # a=1: taps (i, i+1)
)


def upsample2_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                      bias: jnp.ndarray) -> jnp.ndarray:
    """conv3x3(SAME)(nearest_up2(x)) computed at LOW resolution.

    Exact reformulation of the reference Upsample (vqvae_blocks.py:38-53):
    because nearest-up2 duplicates pixels, each output phase (a, b) of the
    3x3 conv on the upsampled grid touches at most a 2x2 window of the
    low-res input, with weights formed by summing the kernel taps that alias
    onto the same low-res pixel (see _PHASE). All 4 phase kernels run as ONE
    2x2 conv with 4*Cout output channels, then a pixel shuffle interleaves
    the phases. 4/9 the MXU FLOPs of the direct form, and the 4x-size
    upsampled intermediate never exists in HBM.

    Numerics: phase kernels are combined in f32 then cast to x.dtype, so
    results match the direct composition up to one extra rounding of the
    summed taps (f32-exact reassociation; pinned by test_ops).

    x: [N,H,W,C]; kernel: [3,3,C,Co] (flax nn.Conv tree); bias: [Co].
    -> [N,2H,2W,Co]
    """
    n, h, w, c = x.shape
    co = kernel.shape[-1]
    k4 = phase_conv_kernel(kernel, x.dtype)
    y = lax.conv_general_dilated(
        x, k4, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [N, H+1, W+1, 4Co]
    return phase_unshuffle(y, n, h, w, co, bias)


def phase_conv_kernel(kernel: jnp.ndarray, dtype) -> jnp.ndarray:
    """Fold a [3,3,C,Co] kernel into the 2x2 4-phase kernel [2,2,C,4Co]
    used by upsample2_conv3x3 (combined in f32, cast to `dtype`)."""
    c, co = kernel.shape[2], kernel.shape[3]
    k32 = kernel.astype(jnp.float32)
    a = jnp.asarray(_PHASE, jnp.float32)            # [2 phase, 2 tap, 3]
    # [tap_u, tap_v, C, phase_a, phase_b, Co] -> 2x2 conv, 4*Co outputs
    k4 = jnp.einsum("aup,bvq,pqio->uviabo", a, a, k32)
    return k4.reshape(2, 2, c, 4 * co).astype(dtype)


def phase_unshuffle(y: jnp.ndarray, n: int, h: int, w: int, co: int,
                    bias: jnp.ndarray) -> jnp.ndarray:
    """Interleave the 4 phase outputs [N,H+1,W+1,4Co] -> [N,2H,2W,Co].

    Phase (a, b) lives at y[:, a:a+H, b:b+W, a, b] (see the derivation in
    upsample2_conv3x3); also exact for an H-sharded y where the extra row
    comes from a neighbor's halo (parallel/halo.py::halo_upsample2_conv3x3).
    """
    y = y.reshape(n, h + 1, w + 1, 2, 2, co)
    p00 = y[:, 0:h, 0:w, 0, 0]
    p01 = y[:, 0:h, 1:w + 1, 0, 1]
    p10 = y[:, 1:h + 1, 0:w, 1, 0]
    p11 = y[:, 1:h + 1, 1:w + 1, 1, 1]
    out = jnp.stack([p00, p01, p10, p11], axis=3)    # [N,H,W,4,Co]
    out = out.reshape(n, h, w, 2, 2, co)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, co)
    return out + bias.astype(out.dtype)


def avg_pool(x: jnp.ndarray, window: int,
             axis_h: int = 1, axis_w: int = 2) -> jnp.ndarray:
    """Non-overlapping average pooling by reshape-mean (exact, fuses well).

    Requires spatial dims divisible by `window`. Matches
    torch.nn.AvgPool2d(window, window, 0).
    """
    if window == 1:
        return x
    shape = x.shape
    h, w = shape[axis_h], shape[axis_w]
    assert h % window == 0 and w % window == 0, (shape, window)
    new_shape = (
        shape[:axis_h] + (h // window, window)
        + shape[axis_h + 1:axis_w] + (w // window, window)
        + shape[axis_w + 1:]
    )
    x = x.reshape(new_shape)
    # After reshape the window dims sit right after each spatial dim.
    return x.mean(axis=(axis_h + 1, axis_w + 2))
