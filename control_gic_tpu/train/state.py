"""Train state: generator + discriminator params, two optimizers, EMA
shadows, and the codebook-usage counters that feed the Huffman table.

Reference recipe (/root/reference/configs/config_train.yaml:4-16,
model.py:192-204): two Adam(lr 5e-5, betas (0.5, 0.9)) optimizers stepped
alternately per batch, gradient clip-by-value 1.0, EMA decay 0.9999 with the
(1+n)/(10+n) warmup (ema.py:24-44), counters persisted in the checkpoint
(quantize.py:28, inference.py:137-139).

Everything is a flax.struct pytree -> shardable with jax.sharding and
checkpointable with orbax.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.cgic import CGIC, CGICConfig
from ..models.discriminator import NLayerDiscriminator
from ..models.lpips import LPIPS
from .losses import LossConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 5e-5
    b1: float = 0.5
    b2: float = 0.9
    grad_clip_value: float = 1.0
    ema_decay: float = 0.9999
    coarse_ratio: float = 0.1
    medium_ratio: float = 0.4
    loss: LossConfig = LossConfig()


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray                    # int32 scalar
    gen_params: Any                      # CGIC params
    disc_params: Any
    disc_batch_stats: Any
    lpips_params: Any                    # frozen
    opt_gen: Any
    opt_disc: Any
    ema_params: Any                      # shadow of gen_params
    ema_num_updates: jnp.ndarray         # int32 scalar
    codebook_counts: jnp.ndarray         # [n_embed] uint32 (Huffman freq
                                         # table needs relative counts only;
                                         # 4e9 tokens/code before wrap)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip(cfg.grad_clip_value),   # clip-by-value, matches reference
        optax.adam(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2),
    )


def create_train_state(rng: jax.Array, model_cfg: CGICConfig,
                       train_cfg: TrainConfig,
                       image_size: int = 256,
                       lpips_params: Optional[Any] = None) -> TrainState:
    model = CGIC(model_cfg)
    disc = NLayerDiscriminator()
    lpips = LPIPS()

    k1, k2, k3 = jax.random.split(rng, 3)
    x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    gen_vars = model.init(k1, x, train_cfg.coarse_ratio,
                          train_cfg.medium_ratio)
    disc_vars = disc.init(k2, x, train=False)
    if lpips_params is None:
        # reference-trained v0.1 lin heads by default (dist_model.py:63-69);
        # the ImageNet backbone stays random unless ported (models/lpips.py)
        from ..models.lpips import with_bundled_lin_heads
        lpips_params = with_bundled_lin_heads(lpips.init(k3, x, x)["params"])

    opt = make_optimizer(train_cfg)
    gen_params = gen_vars["params"]
    disc_params = disc_vars["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        disc_params=disc_params,
        disc_batch_stats=disc_vars.get("batch_stats", {}),
        lpips_params=lpips_params,
        opt_gen=opt.init(gen_params),
        opt_disc=opt.init(disc_params),
        ema_params=jax.tree_util.tree_map(jnp.copy, gen_params),
        ema_num_updates=jnp.zeros((), jnp.int32),
        codebook_counts=jnp.zeros((model_cfg.n_embed,), jnp.uint32),
    )


def ema_update(ema_params, new_params, num_updates, decay: float):
    """LitEma semantics (ema.py:24-44): effective decay
    min(decay, (1+n)/(10+n)), shadow -= (1-d) * (shadow - param)."""
    n = num_updates.astype(jnp.float32)
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    new_ema = jax.tree_util.tree_map(
        lambda s, p: s - (1.0 - d) * (s - p.astype(s.dtype)),
        ema_params, new_params)
    return new_ema, num_updates + 1
