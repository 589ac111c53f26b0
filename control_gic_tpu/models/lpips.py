"""LPIPS (net-lin: AlexNet / VGG16 / SqueezeNet) perceptual metric — NHWC.

Behavioral contract (against /root/reference/CGIC/modules/losses/
perceptual_similarity/):
  - inputs in [0,1] when normalize=True, scaled to [-1,1]
    (perceptual_loss.py:37-39), then the v0.1 scaling layer
    (x - shift) / scale with shift=[-.030,-.088,-.188], scale=[.458,.448,.450]
    (networks_basic.py:94-95)
  - backbone taps (pretrained_networks.py):
    * alex (default, the training loss): torchvision AlexNet.features
      slices [0:2) [2:5) [5:8) [8:10) [10:12) -> relu1..relu5,
      chns (64,192,384,256,256) (pretrained_networks.py:57-95)
    * vgg/vgg16: VGG16.features slices [0:4) [4:9) [9:16) [16:23) [23:30)
      -> relu1_2..relu5_3, chns (64,128,256,512,512)
      (networks_basic.py:36-38, pretrained_networks.py:97-141)
    * squeeze: SqueezeNet1.1.features, 7 slices [0:2) [2:5) [5:8) [8:10)
      [10:11) [11:12) [12:13), chns (64,128,256,384,384,512,512), fire
      modules, ceil-mode 3x3/2 pools (networks_basic.py:42-43,56,
      pretrained_networks.py:5-53)
  - per-layer channel-unit-normalize with eps=1e-10 (perceptual_loss.py:43),
    squared diff, 1x1 bias-free linear head, spatial mean, sum over layers
    (networks_basic.py:61-89).

Weights: the reference downloads the ImageNet backbone at runtime and loads
bundled v0.1 linear heads (dist_model.py:63-69). The v0.1 lin heads for all
three nets ship with THIS package as npz data (lpips_weights/, converted
from the reference's bundled .pth files) and `with_bundled_lin_heads`
installs them into an initialized param tree — this is the default in the
training loss and the infer CLI. Only the torchvision ImageNet *backbone*
remains environment-blocked (no network egress): port one with
`utils/port_torch.py::load_lpips_backbone` when available. With a random
backbone LPIPS is still a valid perceptual-style training signal but not
comparable to published numbers — document in any eval output.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)
CHNS = {
    "alex": (64, 192, 384, 256, 256),
    "vgg": (64, 128, 256, 512, 512),
    "squeeze": (64, 128, 256, 384, 384, 512, 512),
}
_CHNS = CHNS["alex"]


def _max_pool_3x3s2(x):
    # torch MaxPool2d(3, 2): VALID, out = floor((H-3)/2)+1
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


def _max_pool_3x3s2_ceil(x):
    """torch MaxPool2d(3, 2, ceil_mode=True): pad bottom/right so the last
    (possibly partial) window is kept."""
    h, w = x.shape[1], x.shape[2]
    pad_h = (-(h - 3)) % 2
    pad_w = (-(w - 3)) % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


def _max_pool_2x2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")


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


class _VggFeatures(nn.Module):
    """torchvision VGG16.features taps relu1_2..relu5_3, NHWC."""

    @nn.compact
    def __call__(self, x):
        taps = []
        p1 = ((1, 1), (1, 1))
        widths = ((64, 64), (128, 128), (256, 256, 256),
                  (512, 512, 512), (512, 512, 512))
        i = 0
        for si, block in enumerate(widths):
            if si:
                x = _max_pool_2x2(x)
            for w in block:
                x = nn.relu(nn.Conv(w, (3, 3), padding=p1,
                                    name=f"conv{i}")(x))
                i += 1
            taps.append(x)
        return taps


class _Fire(nn.Module):
    """SqueezeNet fire module: squeeze 1x1 -> relu -> (expand1x1 |
    expand3x3) -> concat."""
    squeeze: int
    expand: int

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), name="expand1x1")(s))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3), padding=((1, 1), (1, 1)),
                             name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class _SqueezeFeatures(nn.Module):
    """torchvision SqueezeNet1.1.features, 7 taps, ceil-mode pools."""

    @nn.compact
    def __call__(self, x):
        taps = []
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), padding="VALID",
                            name="conv0")(x))
        taps.append(x)                                         # relu1
        x = _max_pool_3x3s2_ceil(x)
        x = _Fire(16, 64, name="fire3")(x)
        x = _Fire(16, 64, name="fire4")(x)
        taps.append(x)                                         # relu2
        x = _max_pool_3x3s2_ceil(x)
        x = _Fire(32, 128, name="fire6")(x)
        x = _Fire(32, 128, name="fire7")(x)
        taps.append(x)                                         # relu3
        x = _max_pool_3x3s2_ceil(x)
        x = _Fire(48, 192, name="fire9")(x)
        taps.append(x)                                         # relu4
        x = _Fire(48, 192, name="fire10")(x)
        taps.append(x)                                         # relu5
        x = _Fire(64, 256, name="fire11")(x)
        taps.append(x)                                         # relu6
        x = _Fire(64, 256, name="fire12")(x)
        taps.append(x)                                         # relu7
        return taps


_BACKBONES = {"alex": _AlexFeatures, "vgg": _VggFeatures,
              "vgg16": _VggFeatures, "squeeze": _SqueezeFeatures}


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Returns per-image LPIPS distance [B].

    net: 'alex' (the reference training loss, dist_model 'net-lin'+'alex'),
    'vgg'/'vgg16', or 'squeeze' (networks_basic.py:36-43 variants).
    """
    net: str = "alex"

    @nn.compact
    def __call__(self, pred, target, *, normalize: bool = True):
        if normalize:
            pred = 2.0 * pred - 1.0
            target = 2.0 * target - 1.0
        shift = jnp.asarray(_SHIFT, jnp.float32)
        scale = jnp.asarray(_SCALE, jnp.float32)
        pred = (pred - shift) / scale
        target = (target - shift) / scale

        chns = CHNS["vgg" if self.net == "vgg16" else self.net]
        net = _BACKBONES[self.net](name="net")
        f0 = net(pred.astype(jnp.float32))
        f1 = net(target.astype(jnp.float32))

        total = 0.0
        for k, (a, b) in enumerate(zip(f0, f1)):
            diff = jnp.square(_unit_normalize(a) - _unit_normalize(b))
            # bias-free 1x1 conv head == channel-weighted sum
            w = self.param(f"lin{k}",
                           nn.initializers.ones_init(), (chns[k],))
            contrib = jnp.einsum("bhwc,c->bhw", diff, w)
            total = total + contrib.mean(axis=(1, 2))
        return total


_WEIGHTS_DIR = os.path.join(os.path.dirname(__file__), "lpips_weights")


def bundled_lin_heads(net: str = "alex") -> dict:
    """The reference's v0.1 LPIPS linear-head weights as {'lin0': [chn], ...}
    (bundled as npz data; original load site dist_model.py:63-69)."""
    net = "vgg" if net == "vgg16" else net
    with np.load(os.path.join(_WEIGHTS_DIR, f"{net}_lin.npz")) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}


def with_bundled_lin_heads(params: dict, net: str = "alex") -> dict:
    """Return a copy of an initialized LPIPS param tree with the lin heads
    replaced by the reference's trained v0.1 weights."""
    heads = bundled_lin_heads(net)
    out = dict(params)
    for k, v in heads.items():
        assert out[k].shape == v.shape, (k, out[k].shape, v.shape)
        out[k] = v
    return out
