"""PatchGAN discriminator (pix2pix NLayerDiscriminator), NHWC flax.

Behavioral contract: /root/reference/CGIC/modules/discriminator/model.py:17-68
with the training config disc_num_layers=2, ndf=64 (config_train.yaml:63-66):
  conv(3->64, k4 s2 p1) + LeakyReLU(0.2)
  conv(64->128, k4 s2 p1, no bias) + BatchNorm + LeakyReLU
  conv(128->256, k4 s1 p1, no bias) + BatchNorm + LeakyReLU
  conv(256->1, k4 s1 p1) -> logit map

BatchNorm runs per-replica under data parallelism (the reference's DDP
BatchNorm is per-GPU too); pass `axis_name` to sync across the mesh if
desired. Running stats live in the `batch_stats` collection.

`use_actnorm=True` swaps every norm for ActNorm (reference
discriminator/model.py:30-37 + modules/util.py:10-92): a per-channel affine
`scale * (x + loc)` whose parameters are meant to be data-initialized from
the first batch (loc = -mean, scale = 1/(std + 1e-6)). Flax params are
immutable inside apply, so the data-dependent init is an explicit host step:
call `actnorm_init(params, first_batch_stats)` once before training (see
`actnorm_data_init`). With ActNorm the inner convs keep their bias, exactly
as the reference's `use_bias = norm_layer != nn.BatchNorm2d` rule.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class ActNorm(nn.Module):
    """Per-channel affine norm: scale * (x + loc) (modules/util.py:53-68).

    loc/scale are ordinary trainable params (zero / one by default); use
    `actnorm_data_init` to compute the reference's data-dependent init.
    """
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        loc = self.param("loc", nn.initializers.zeros, (c,))
        scale = self.param("scale", nn.initializers.ones, (c,))
        return (scale * (x + loc)).astype(self.dtype)


def actnorm_data_init(x: jnp.ndarray):
    """(loc, scale) from a representative batch: loc=-mean, scale=1/(std+1e-6)
    with the reference's Bessel-corrected std (util.py:22-41). x: [B,H,W,C]."""
    xf = jnp.asarray(x, jnp.float32).reshape(-1, x.shape[-1])
    mean = xf.mean(axis=0)
    std = jnp.sqrt(xf.var(axis=0, ddof=1))
    return -mean, 1.0 / (std + 1e-6)


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 2
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None   # set to sync BatchNorm across devices
    use_actnorm: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def norm(h, name):
            if self.use_actnorm:
                return ActNorm(dtype=jnp.float32, name=name)(h)
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis_name=self.axis_name if train else None,
                dtype=jnp.float32, name=name)(h)

        lrelu = lambda h: nn.leaky_relu(h, 0.2)
        p1 = ((1, 1), (1, 1))
        bias = self.use_actnorm   # reference model.py:34-37

        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=p1,
                    dtype=self.dtype, name="conv0")(x)
        h = lrelu(h)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2), padding=p1,
                        use_bias=bias, dtype=self.dtype, name=f"conv{n}")(h)
            h = norm(h, f"bn{n}")
            h = lrelu(h)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1), padding=p1,
                    use_bias=bias, dtype=self.dtype,
                    name=f"conv{self.n_layers}")(h)
        h = norm(h, f"bn{self.n_layers}")
        h = lrelu(h)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=p1,
                       dtype=self.dtype, name="conv_out")(h)
