"""LPIPS (net-lin, AlexNet) perceptual metric in JAX/flax — NHWC.

Behavioral contract (against /root/reference/CGIC/modules/losses/
perceptual_similarity/):
  - inputs in [0,1] when normalize=True, scaled to [-1,1]
    (perceptual_loss.py:37-39), then the v0.1 scaling layer
    (x - shift) / scale with shift=[-.030,-.088,-.188], scale=[.458,.448,.450]
    (networks_basic.py:94-95)
  - AlexNet feature taps relu1..relu5 (pretrained_networks.py:57-95):
    torchvision AlexNet.features indices [0:2), [2:5), [5:8), [8:10), [10:12)
    i.e. conv(3->64,k11,s4,p2)+relu | maxpool(3,2)+conv(64->192,k5,p2)+relu |
    maxpool+conv(192->384,k3,p1)+relu | conv(384->256,k3,p1)+relu |
    conv(256->256,k3,p1)+relu
  - per-layer channel-unit-normalize with eps=1e-10 (perceptual_loss.py:43),
    squared diff, 1x1 bias-free linear head, spatial mean, sum over layers
    (networks_basic.py:61-89).

Weights: the reference downloads the ImageNet backbone at runtime and loads
bundled v0.1 linear heads. This environment has no network egress, so the
module random-initializes and `utils/port_torch.py::load_lpips_torch`
overwrites params from torch files when available (the lin heads alex.pth
exist in-tree at the reference mount). With random backbone weights LPIPS is
still a valid perceptual-style training signal but not comparable to
published numbers — document in any eval output.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)
_CHNS = (64, 192, 384, 256, 256)


def _max_pool_3x3s2(x):
    # torch MaxPool2d(3, 2): VALID, out = floor((H-3)/2)+1
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class _AlexFeatures(nn.Module):
    """torchvision AlexNet.features up to relu5, NHWC, returning all 5 taps."""

    @nn.compact
    def __call__(self, x):
        taps = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                    name="conv0")(x)
        x = nn.relu(x)
        taps.append(x)
        x = _max_pool_3x3s2(x)
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), name="conv1")(x)
        x = nn.relu(x)
        taps.append(x)
        x = _max_pool_3x3s2(x)
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv4")(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Returns per-image LPIPS distance [B]."""

    @nn.compact
    def __call__(self, pred, target, *, normalize: bool = True):
        if normalize:
            pred = 2.0 * pred - 1.0
            target = 2.0 * target - 1.0
        shift = jnp.asarray(_SHIFT, jnp.float32)
        scale = jnp.asarray(_SCALE, jnp.float32)
        pred = (pred - shift) / scale
        target = (target - shift) / scale

        net = _AlexFeatures(name="net")
        f0 = net(pred.astype(jnp.float32))
        f1 = net(target.astype(jnp.float32))

        total = 0.0
        for k, (a, b) in enumerate(zip(f0, f1)):
            diff = jnp.square(_unit_normalize(a) - _unit_normalize(b))
            # bias-free 1x1 conv head == channel-weighted sum
            w = self.param(f"lin{k}",
                           nn.initializers.ones_init(), (_CHNS[k],))
            contrib = jnp.einsum("bhwc,c->bhw", diff, w)
            total = total + contrib.mean(axis=(1, 2))
        return total
