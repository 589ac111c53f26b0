"""Port reference PyTorch checkpoints into control_gic_tpu parameter pytrees.

Maps the state_dict of the reference CGIC Lightning checkpoint
(/root/reference/CGIC/models/model.py:22-81 module tree) onto our flax
params, converting conv kernels from torch OIHW to flax HWIO. Also extracts
the codebook-usage counters (quantize.embedding_counter.{i}) that seed the
Huffman frequency table, and the LPIPS linear heads from the bundled
alex.pth.

torch is only needed to *read* .ckpt files; everything returned is numpy.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch [O, I, kh, kw] -> flax [kh, kw, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _resnet_paths(prefix: Tuple[str, ...], zq_cond: bool, key: str,
                  out: dict, val: np.ndarray) -> bool:
    """Map a reference ResnetBlock param (norm1/conv1/norm2/conv2/
    nin_shortcut[.conv_y...]) into our block tree."""
    m = re.match(r"(norm1|norm2)\.(.*)", key)
    if m:
        norm, rest = m.groups()
        if zq_cond:
            sub = {"norm_layer.weight": ("spatial", "norm_layer", "scale"),
                   "norm_layer.bias": ("spatial", "norm_layer", "bias"),
                   "conv_y.weight": ("spatial", "conv_y", "kernel"),
                   "conv_y.bias": ("spatial", "conv_y", "bias"),
                   "conv_b.weight": ("spatial", "conv_b", "kernel"),
                   "conv_b.bias": ("spatial", "conv_b", "bias")}
            if rest not in sub:
                return False
            tail = sub[rest]
            v = _conv_kernel(val) if tail[-1] == "kernel" else val
            _set(out, prefix + (norm,) + tail, v)
        else:
            sub = {"weight": ("group", "norm", "scale"),
                   "bias": ("group", "norm", "bias")}
            if rest not in sub:
                return False
            _set(out, prefix + (norm,) + sub[rest], val)
        return True
    m = re.match(r"(conv1|conv2|nin_shortcut|conv_shortcut)\.(weight|bias)",
                 key)
    if m:
        conv, wb = m.groups()
        v = _conv_kernel(val) if wb == "weight" else val
        _set(out, prefix + (conv, "kernel" if wb == "weight" else "bias"), v)
        return True
    return False


def _attn_paths(prefix: Tuple[str, ...], zq_cond: bool, key: str,
                out: dict, val: np.ndarray) -> bool:
    m = re.match(r"norm\.(.*)", key)
    if m:
        rest = m.group(1)
        if zq_cond:
            sub = {"norm_layer.weight": ("spatial", "norm_layer", "scale"),
                   "norm_layer.bias": ("spatial", "norm_layer", "bias"),
                   "conv_y.weight": ("spatial", "conv_y", "kernel"),
                   "conv_y.bias": ("spatial", "conv_y", "bias"),
                   "conv_b.weight": ("spatial", "conv_b", "kernel"),
                   "conv_b.bias": ("spatial", "conv_b", "bias")}
        else:
            sub = {"weight": ("group", "norm", "scale"),
                   "bias": ("group", "norm", "bias")}
        if rest not in sub:
            return False
        tail = sub[rest]
        v = _conv_kernel(val) if tail[-1] == "kernel" else val
        _set(out, prefix + ("norm",) + tail, v)
        return True
    m = re.match(r"(q|k|v|proj_out)\.(weight|bias)", key)
    if m:
        conv, wb = m.groups()
        v = _conv_kernel(val) if wb == "weight" else val
        _set(out, prefix + (conv, "kernel" if wb == "weight" else "bias"), v)
        return True
    return False


def _groupnorm_paths(prefix: Tuple[str, ...], key_rest: str, out: dict,
                     val: np.ndarray) -> bool:
    """Bare GroupNorm32 (e.g. the encoder heads' norm_out): path <prefix>/norm."""
    sub = {"weight": ("norm", "scale"), "bias": ("norm", "bias")}
    if key_rest not in sub:
        return False
    _set(out, prefix + sub[key_rest], val)
    return True


def _spatialnorm_paths(prefix: Tuple[str, ...], key_rest: str, out: dict,
                       val: np.ndarray) -> bool:
    sub = {"norm_layer.weight": ("norm_layer", "scale"),
           "norm_layer.bias": ("norm_layer", "bias"),
           "conv_y.weight": ("conv_y", "kernel"),
           "conv_y.bias": ("conv_y", "bias"),
           "conv_b.weight": ("conv_b", "kernel"),
           "conv_b.bias": ("conv_b", "bias")}
    if key_rest not in sub:
        return False
    tail = sub[key_rest]
    v = _conv_kernel(val) if tail[-1] == "kernel" else val
    _set(out, prefix + tail, v)
    return True


def port_cgic_state_dict(sd: Dict[str, np.ndarray]
                         ) -> Tuple[dict, np.ndarray]:
    """Reference state_dict -> (flax params dict, counters [n_embed]).

    Handles the full module tree of model.py: encoder.*, decoder.*,
    quantize.*, quant_conv/post_quant_conv. EMA/loss/discriminator keys are
    ignored (port them separately if needed).
    """
    params: dict = {}
    n_embed = None
    counters: Dict[int, float] = {}

    for key, val in sd.items():
        # ---------------- quantizer
        m = re.match(r"quantize\.embedding\.weight$", key)
        if m:
            params["codebook"] = val
            n_embed = val.shape[0]
            continue
        m = re.match(r"quantize\.embedding_counter\.(\d+)$", key)
        if m:
            counters[int(m.group(1))] = float(val.reshape(-1)[0])
            continue
        m = re.match(r"(quant_conv|post_quant_conv)\.(weight|bias)$", key)
        if m:
            name, wb = m.groups()
            v = _conv_kernel(val) if wb == "weight" else val
            _set(params, (name, "kernel" if wb == "weight" else "bias"), v)
            continue

        # ---------------- encoder
        m = re.match(r"encoder\.conv_in\.(weight|bias)$", key)
        if m:
            wb = m.group(1)
            v = _conv_kernel(val) if wb == "weight" else val
            _set(params, ("encoder", "conv_in",
                          "kernel" if wb == "weight" else "bias"), v)
            continue
        m = re.match(r"encoder\.down\.(\d+)\.block\.(\d+)\.(.*)$", key)
        if m:
            i, j, rest = m.groups()
            ok = _resnet_paths(("encoder", f"down_{i}_block_{j}"), False,
                               rest, params, val)
            assert ok, key
            continue
        m = re.match(r"encoder\.down\.(\d+)\.attn\.(\d+)\.(.*)$", key)
        if m:
            i, j, rest = m.groups()
            ok = _attn_paths(("encoder", f"down_{i}_attn_{j}"), False,
                             rest, params, val)
            assert ok, key
            continue
        m = re.match(r"encoder\.down\.(\d+)\.downsample\.conv\.(weight|bias)$",
                     key)
        if m:
            i, wb = m.groups()
            v = _conv_kernel(val) if wb == "weight" else val
            _set(params, ("encoder", f"down_{i}_downsample", "conv",
                          "kernel" if wb == "weight" else "bias"), v)
            continue
        # encoder heads: mid_fine/mid/mid_coarse + their norm/conv outs
        head_map = {"mid_fine": "head_fine", "mid": "head_medium",
                    "mid_coarse": "head_coarse"}
        m = re.match(r"encoder\.(mid_fine|mid_coarse|mid)\."
                     r"(block_1|block_2|attn_1)\.(.*)$", key)
        if m:
            which, sub, rest = m.groups()
            prefix = ("encoder", head_map[which], sub)
            fn = _attn_paths if sub == "attn_1" else _resnet_paths
            ok = fn(prefix, False, rest, params, val)
            assert ok, key
            continue
        m = re.match(r"encoder\.norm_out(_fine|_coarse)?\.(weight|bias)$", key)
        if m:
            suffix, wb = m.groups()
            head = {"_fine": "head_fine", "_coarse": "head_coarse",
                    None: "head_medium"}[suffix]
            ok = _groupnorm_paths(("encoder", head, "norm_out"), wb,
                                  params, val)
            assert ok, key
            continue
        m = re.match(r"encoder\.conv_out(_fine|_coarse)?\.(weight|bias)$", key)
        if m:
            suffix, wb = m.groups()
            head = {"_fine": "head_fine", "_coarse": "head_coarse",
                    None: "head_medium"}[suffix]
            v = _conv_kernel(val) if wb == "weight" else val
            _set(params, ("encoder", head, "conv_out",
                          "kernel" if wb == "weight" else "bias"), v)
            continue

        # ---------------- decoder
        m = re.match(r"decoder\.(conv_in_coarse|conv_in_fine|conv_in)\."
                     r"(weight|bias)$", key)
        if m:
            name, wb = m.groups()
            v = _conv_kernel(val) if wb == "weight" else val
            _set(params, ("decoder", name,
                          "kernel" if wb == "weight" else "bias"), v)
            continue
        m = re.match(r"decoder\.(mid_fine|mid_coarse|mid)\."
                     r"(block_1|block_2|attn_1)\.(.*)$", key)
        if m:
            which, sub, rest = m.groups()
            prefix = ("decoder", which, sub)
            fn = _attn_paths if sub == "attn_1" else _resnet_paths
            ok = fn(prefix, True, rest, params, val)
            assert ok, key
            continue
        m = re.match(r"decoder\.up\.(\d+)\.block\.(\d+)\.(.*)$", key)
        if m:
            i, j, rest = m.groups()
            ok = _resnet_paths(("decoder", f"up_{i}_block_{j}"), True,
                               rest, params, val)
            assert ok, key
            continue
        m = re.match(r"decoder\.up\.(\d+)\.attn\.(\d+)\.(.*)$", key)
        if m:
            i, j, rest = m.groups()
            ok = _attn_paths(("decoder", f"up_{i}_attn_{j}"), True,
                             rest, params, val)
            assert ok, key
            continue
        m = re.match(r"decoder\.up\.(\d+)\.upsample\.conv\.(weight|bias)$",
                     key)
        if m:
            i, wb = m.groups()
            v = _conv_kernel(val) if wb == "weight" else val
            _set(params, ("decoder", f"up_{i}_upsample", "conv",
                          "kernel" if wb == "weight" else "bias"), v)
            continue
        m = re.match(r"decoder\.norm_out\.(.*)$", key)
        if m:
            ok = _spatialnorm_paths(("decoder", "norm_out"), m.group(1),
                                    params, val)
            assert ok, key
            continue
        m = re.match(r"decoder\.conv_out\.(weight|bias)$", key)
        if m:
            wb = m.group(1)
            v = _conv_kernel(val) if wb == "weight" else val
            _set(params, ("decoder", "conv_out",
                          "kernel" if wb == "weight" else "bias"), v)
            continue
        # ignored: ema_*, loss.*, entropy_calculation_* (no params)

    counts = np.zeros(n_embed or 1024, np.int64)
    for i, c in counters.items():
        counts[i] = int(c)
    return params, counts


def port_cgic_checkpoint(path: str) -> Tuple[dict, np.ndarray]:
    return port_cgic_state_dict(_load_torch_state_dict(path))


_LPIPS_CONV_IDX = {
    # torchvision `features.<i>` conv index -> our flax module name
    "alex": {0: "conv0", 3: "conv1", 6: "conv2", 8: "conv3", 10: "conv4"},
    "vgg": {i: f"conv{n}" for n, i in
            enumerate((0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28))},
}
_SQUEEZE_FIRE_IDX = (3, 4, 6, 7, 9, 10, 11, 12)


def load_lpips_backbone(features_sd, net: str = "alex") -> dict:
    """torchvision `<model>.features` state_dict (or a path to one) ->
    flax params for models/lpips._{Alex,Vgg,Squeeze}Features.

    Accepts keys with or without a 'features.' prefix (pass e.g.
    torchvision.models.alexnet().features.state_dict() or the full model's
    state_dict)."""
    if isinstance(features_sd, str):
        features_sd = _load_torch_state_dict(features_sd)
    sd = {}
    for k, v in features_sd.items():
        k = re.sub(r"^(net\.|model\.)?features\.", "", k)
        sd[k] = np.asarray(v)

    out: dict = {}
    net = "vgg" if net == "vgg16" else net
    if net in _LPIPS_CONV_IDX:
        for i, name in _LPIPS_CONV_IDX[net].items():
            out[name] = {"kernel": _conv_kernel(sd[f"{i}.weight"]),
                         "bias": sd[f"{i}.bias"]}
    elif net == "squeeze":
        out["conv0"] = {"kernel": _conv_kernel(sd["0.weight"]),
                        "bias": sd["0.bias"]}
        for i in _SQUEEZE_FIRE_IDX:
            out[f"fire{i}"] = {
                sub: {"kernel": _conv_kernel(sd[f"{i}.{sub}.weight"]),
                      "bias": sd[f"{i}.{sub}.bias"]}
                for sub in ("squeeze", "expand1x1", "expand3x3")}
    else:
        raise ValueError(f"unknown LPIPS backbone {net!r}")
    return out


def load_lpips_lin_heads(alex_pth_path: str) -> Dict[str, np.ndarray]:
    """Bundled alex.pth lin heads -> {'lin0'..'lin4': [chn]} weight vectors
    (dist_model.py:63-69, networks_basic.py:101-108)."""
    import torch
    sd = torch.load(alex_pth_path, map_location="cpu", weights_only=False)
    out = {}
    for k, v in sd.items():
        m = re.match(r"lin(\d)\.model\.(\d)\.weight", k)
        if m:
            out[f"lin{m.group(1)}"] = v.detach().numpy().reshape(-1)
    return out
