"""LPIPS parity vs torch: backbone taps (alex/vgg/squeeze, random weights
ported through utils/port_torch.load_lpips_backbone) and the full net-lin
distance against a literal torch transcription of networks_basic.py math.

The torchvision `.features` stacks are transcribed in plain torch (same
module indices/attribute names, so state_dicts are interchangeable) —
runs offline without torchvision; with real ImageNet weights supplied the
same port path reproduces published LPIPS.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from control_gic_tpu.models.lpips import _BACKBONES, CHNS, LPIPS
from control_gic_tpu.utils.port_torch import load_lpips_backbone

# reference slice ends per net (pretrained_networks.py)
SLICES = {"alex": (2, 5, 8, 10, 12), "vgg": (4, 9, 16, 23, 30),
          "squeeze": (2, 5, 8, 10, 11, 12, 13)}


def _torch_features(net):
    """The torchvision `.features` stacks, transcribed in plain torch (so
    this runs without torchvision; with torchvision installed the
    state_dict keys are interchangeable — same indices/attribute names)."""
    torch = pytest.importorskip("torch")
    nn_ = torch.nn
    C, R = nn_.Conv2d, nn_.ReLU

    class Fire(nn_.Module):
        def __init__(self, inp, s, e):
            super().__init__()
            self.squeeze = C(inp, s, 1)
            self.expand1x1 = C(s, e, 1)
            self.expand3x3 = C(s, e, 3, padding=1)

        def forward(self, x):
            x = torch.relu(self.squeeze(x))
            return torch.cat([torch.relu(self.expand1x1(x)),
                              torch.relu(self.expand3x3(x))], 1)

    MP = lambda ceil=False: nn_.MaxPool2d(3, 2, ceil_mode=ceil)
    if net == "alex":
        return nn_.Sequential(
            C(3, 64, 11, 4, 2), R(), MP(), C(64, 192, 5, padding=2), R(),
            MP(), C(192, 384, 3, padding=1), R(),
            C(384, 256, 3, padding=1), R(), C(256, 256, 3, padding=1), R())
    if net == "vgg":
        layers, inc = [], 3
        for block in ((64, 64), (128, 128), (256, 256, 256),
                      (512, 512, 512), (512, 512, 512)):
            for w in block:
                layers += [C(inc, w, 3, padding=1), R()]
                inc = w
            layers.append(nn_.MaxPool2d(2, 2))
        return nn_.Sequential(*layers)
    # squeezenet 1.1
    return nn_.Sequential(
        C(3, 64, 3, 2), R(), MP(ceil=True),
        Fire(64, 16, 64), Fire(128, 16, 64), MP(ceil=True),
        Fire(128, 32, 128), Fire(256, 32, 128), MP(ceil=True),
        Fire(256, 48, 192), Fire(384, 48, 192),
        Fire(384, 64, 256), Fire(512, 64, 256))


def _torch_taps(features, x, ends):
    taps, h, i0 = [], x, 0
    for e in ends:
        for i in range(i0, e):
            h = features[i](h)
        taps.append(h)
        i0 = e
    return taps


@pytest.mark.parametrize("net", ["alex", "vgg", "squeeze"])
def test_backbone_taps_match_torchvision(net, rng):
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    feats = _torch_features(net).eval()
    params = load_lpips_backbone(feats.state_dict(), net)

    # 66x66 exercises the squeeze ceil-mode pooling (odd - 3 residue)
    x = rng.uniform(-1, 1, (1, 3, 66, 66)).astype(np.float32)
    with torch.no_grad():
        taps_t = _torch_taps(feats, torch.from_numpy(x), SLICES[net])
    mod = _BACKBONES[net]()
    taps_j = mod.apply({"params": params},
                       jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(taps_j) == len(CHNS[net])
    for tt, tj in zip(taps_t, taps_j):
        want = tt.numpy().transpose(0, 2, 3, 1)
        assert tj.shape == want.shape, (tj.shape, want.shape)
        np.testing.assert_allclose(np.asarray(tj), want,
                                   atol=2e-4, rtol=2e-3)


def test_full_lpips_matches_torch_math(rng):
    """Full net-lin distance vs a literal torch transcription of
    networks_basic.py:61-95 (scaling layer, unit-normalize, squared diff,
    lin head, spatial mean, layer sum)."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    feats = _torch_features("alex").eval()
    params = dict(load_lpips_backbone(feats.state_dict(), "alex"))
    lin_ws = [np.abs(rng.normal(1.0, 0.2, c)).astype(np.float32)
              for c in CHNS["alex"]]
    variables = {"params": {"net": params,
                            **{f"lin{k}": jnp.asarray(w)
                               for k, w in enumerate(lin_ws)}}}

    a = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    b = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def torch_lpips(x0, x1):
        x0 = (torch.from_numpy(x0) * 2 - 1 - shift) / scale
        x1 = (torch.from_numpy(x1) * 2 - 1 - shift) / scale
        with torch.no_grad():
            t0 = _torch_taps(feats, x0, SLICES["alex"])
            t1 = _torch_taps(feats, x1, SLICES["alex"])
        total = 0.0
        for k, (f0, f1) in enumerate(zip(t0, t1)):
            # exact reference normalize: x / (sqrt(sum x^2) + 1e-10)
            n0 = f0 / ((f0 ** 2).sum(1, keepdim=True).sqrt() + 1e-10)
            n1 = f1 / ((f1 ** 2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (n0 - n1) ** 2
            w = torch.from_numpy(lin_ws[k]).view(1, -1, 1, 1)
            total = total + (d * w).sum(1).mean(dim=(1, 2))
        return total.numpy()

    want = torch_lpips(a, b)
    got = LPIPS().apply(variables, jnp.asarray(a.transpose(0, 2, 3, 1)),
                        jnp.asarray(b.transpose(0, 2, 3, 1)),
                        normalize=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("net", ["vgg", "squeeze"])
def test_lpips_variant_modules_run(net, rng):
    import jax
    mod = LPIPS(net=net)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x, x)
    out = mod.apply(v, x, x)
    assert out.shape == (1,)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

REF_W = ("/root/reference/CGIC/modules/losses/perceptual_similarity/"
         "weights/v0.1")


@pytest.mark.parametrize("net", ["alex", "vgg", "squeeze"])
def test_bundled_lin_heads_match_reference_pth(net):
    """The npz heads shipped in models/lpips_weights/ are bit-identical to
    the reference's bundled v0.1 .pth heads (dist_model.py:63-69)."""
    import os
    from control_gic_tpu.models.lpips import bundled_lin_heads
    from control_gic_tpu.utils.port_torch import load_lpips_lin_heads
    path = os.path.join(REF_W, f"{net}.pth")
    if not os.path.exists(path):
        pytest.skip("reference weight mount not available")
    want = load_lpips_lin_heads(path)
    got = bundled_lin_heads(net)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), want[k])
        assert np.asarray(got[k]).min() >= 0  # heads are ReLU-projected >= 0


def test_with_bundled_lin_heads_installs(rng):
    import jax
    from control_gic_tpu.models.lpips import (LPIPS, bundled_lin_heads,
                                              with_bundled_lin_heads)
    mod = LPIPS()
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, x)["params"]
    ported = with_bundled_lin_heads(params)
    heads = bundled_lin_heads()
    for k, v in heads.items():
        np.testing.assert_array_equal(np.asarray(ported[k]), np.asarray(v))
    # still applies cleanly and zero-distance property holds
    out = mod.apply({"params": ported}, x, x)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
