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
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 2
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None   # set to sync BatchNorm across devices

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis_name=self.axis_name if train else None,
                dtype=jnp.float32, name=name)(h)

        lrelu = lambda h: nn.leaky_relu(h, 0.2)
        p1 = ((1, 1), (1, 1))

        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=p1,
                    dtype=self.dtype, name="conv0")(x)
        h = lrelu(h)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2), padding=p1,
                        use_bias=False, dtype=self.dtype, name=f"conv{n}")(h)
            h = bn(h, f"bn{n}")
            h = lrelu(h)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1), padding=p1,
                    use_bias=False, dtype=self.dtype,
                    name=f"conv{self.n_layers}")(h)
        h = bn(h, f"bn{self.n_layers}")
        h = lrelu(h)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=p1,
                       dtype=self.dtype, name="conv_out")(h)
