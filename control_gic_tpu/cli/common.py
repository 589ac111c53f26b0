"""Shared CLI plumbing: model/codec construction from config + checkpoint."""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codec import CGICCodec
from ..models import CGIC, CGICConfig


def enable_compilation_cache():
    # per-backend AND machine-keyed cache dir (utils/cache.py): entries
    # AOT-compiled for one machine/backend must not be loaded by another
    # (SIGILL risk / loud cpu_aot_loader warnings on every lookup)
    from ..utils.cache import setup_compilation_cache
    setup_compilation_cache()


def build_codec(ckpt: Optional[str] = None,
                config: Optional[CGICConfig] = None,
                seed: int = 0, use_ema: bool = False) -> CGICCodec:
    """Construct a CGICCodec from either an orbax checkpoint directory, a
    reference torch .ckpt (ported on the fly), or random init (no ckpt).

    config=None mirrors configs/inference.yaml: activations in bfloat16 on
    an accelerator (2x MXU rate; also the only flash-attention-tuned
    dtype), float32 on CPU where parity tests live.

    use_ema selects the EMA shadow weights from a training checkpoint
    (smoother reconstructions late in training; the reference carries EMA
    shadows in its checkpoints but never consumes them — SURVEY.md §2 item
    12 — so default False matches its behavior)."""
    if config is None:
        on_acc = jax.default_backend() not in ("cpu", "gpu")
        config = CGICConfig(dtype="bfloat16" if on_acc else "float32")
    model = CGIC(config)
    counts = np.ones(config.n_embed, np.int64)

    if ckpt and os.path.isfile(ckpt) and ckpt.endswith((".ckpt", ".pth", ".pt")):
        from ..utils.port_torch import port_cgic_checkpoint
        params, counts = port_cgic_checkpoint(ckpt)
        variables = {"params": params}
        # counters can be all-zero in fresh checkpoints; keep Huffman valid
        if counts.sum() == 0:
            counts = np.ones_like(counts)
    elif ckpt and os.path.isdir(ckpt):
        from ..utils.checkpoint import restore_checkpoint
        restored = restore_checkpoint(ckpt)
        # accept either a raw variables dict or a TrainState-like dict
        if "gen_params" in restored:
            which = "ema_params" if use_ema else "gen_params"
            variables = {"params": restored[which]}
            counts = np.asarray(restored["codebook_counts"])
            if counts.sum() == 0:
                counts = np.ones_like(counts)
        else:
            variables = restored if "params" in restored else {
                "params": restored}
    else:
        if ckpt:
            raise FileNotFoundError(ckpt)
        print("WARNING: no checkpoint given — using random weights "
              "(pipeline demo only; reconstructions will be noise).")
        variables = model.init(jax.random.PRNGKey(seed),
                               jnp.zeros((1, config.resolution,
                                          config.resolution, 3)), 0.1, 0.4)

    return CGICCodec(model, variables, counts)


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image
    img = np.asarray(img)
    if img.dtype == np.uint8:      # already device-quantized (same math)
        Image.fromarray(img).save(path)
        return
    arr = np.clip(img, 0.0, 1.0)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)
