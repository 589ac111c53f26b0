"""Per-patch Shannon entropy via a Gaussian-KDE soft histogram.

Behavioral contract (matches the reference estimator,
/root/reference/CGIC/models/model.py:433-483):
  - grayscale = 0.2989 R + 0.5870 G + 0.1140 B
  - non-overlapping psize x psize patches
  - 32 histogram bins spanning [-1, 1], sigma = 0.01, epsilon = 1e-40
  - pdf = mean_over_pixels(exp(-0.5((v - bin)/sigma)^2))
    pdf = pdf / (sum(pdf) + eps) + eps
    H = -sum(pdf * log(pdf))

TPU notes: the whole computation is element-wise + small reductions, NHWC,
static shapes — XLA fuses it into a handful of VPU loops. The [P, 32]
broadcast per patch is the only expansion; for a 256x256 image at p=8 that
is 256*1024*32 f32 = 32 MB of transient, well within fusion (never
materialized in HBM).
"""
from __future__ import annotations

import jax.numpy as jnp

_GRAY_WEIGHTS = (0.2989, 0.5870, 0.1140)
_NUM_BINS = 32
_SIGMA = 0.01
_EPS = 1e-40


def patch_entropy(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Entropy map of non-overlapping patches.

    Args:
      x: [B, H, W, 3] image batch (any range; bins are fixed to [-1, 1]).
      patch_size: patch edge in pixels (static).

    Returns:
      [B, H // patch_size, W // patch_size] float32 entropy map.
    """
    b, h, w, c = x.shape
    assert c == 3, f"expected RGB NHWC input, got {x.shape}"
    p = patch_size
    assert h % p == 0 and w % p == 0, (x.shape, p)

    x = x.astype(jnp.float32)
    gray = (_GRAY_WEIGHTS[0] * x[..., 0]
            + _GRAY_WEIGHTS[1] * x[..., 1]
            + _GRAY_WEIGHTS[2] * x[..., 2])                    # [B, H, W]

    # [B, Hn, p, Wn, p] -> [B, Hn, Wn, p*p]
    patches = gray.reshape(b, h // p, p, w // p, p)
    patches = patches.transpose(0, 1, 3, 2, 4).reshape(b, h // p, w // p, p * p)

    bins = jnp.linspace(-1.0, 1.0, _NUM_BINS, dtype=jnp.float32)
    resid = patches[..., None] - bins                          # [B,Hn,Wn,P,32]
    kernel = jnp.exp(-0.5 * jnp.square(resid / _SIGMA))
    pdf = kernel.mean(axis=-2)                                 # [B,Hn,Wn,32]
    norm = pdf.sum(axis=-1, keepdims=True) + _EPS
    pdf = pdf / norm + _EPS
    # The reference adds eps=1e-40 and relies on f32 denormals to keep
    # log(pdf) finite; XLA flushes denormals to zero, so mask instead.
    # Terms with pdf <= tiny contribute ~1e-38 in the reference — i.e. zero.
    tiny = jnp.float32(1e-37)  # smallest safe normal (FTZ-proof)
    plogp = jnp.where(pdf > tiny, pdf * jnp.log(jnp.maximum(pdf, tiny)), 0.0)
    return -plogp.sum(axis=-1)
