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

import jax.numpy as jnp


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
