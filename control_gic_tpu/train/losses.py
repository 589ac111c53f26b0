"""VQ-LPIPS-GAN loss stack.

Behavioral contract: /root/reference/CGIC/modules/losses/vqperceptual.py:33-125.
  generator:    loss = mean((x - x̂)^2 + pw * LPIPS) + 0.1 * (-mean(D(x̂)))
                       + 1.0 * codebook_loss
                (the adaptive discriminator weight and disc_start schedule in
                the reference are dead code — the effective constants are the
                hard-coded 0.1 / 1.0 at vqperceptual.py:99; we expose them as
                config with those defaults)
  discriminator: hinge loss 0.5*(mean(relu(1 - D(x))) + mean(relu(1 + D(x̂))))
                 (or the vanilla softplus form)

Reference quirk replicated on purpose: LPIPS is called with normalize=True
(expects [0,1]) on training tensors that are in [-1,1] (vqperceptual.py:83,
dataset.py:85) — training parity requires the same convention.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class LossConfig:
    codebook_weight: float = 1.0
    perceptual_weight: float = 1.0
    g_weight: float = 0.1
    disc_loss: str = "hinge"      # or "vanilla"
    lpips_normalize: bool = True  # reference convention (see module doc)
    # Opt-in GAN scheduling knobs (defaults replicate the reference's
    # EFFECTIVE behavior — both features exist in the reference as dead
    # code, vqperceptual.py:13-16,67-78, and are never applied there):
    disc_start: int = 0           # steps before the adversarial terms
                                  # engage (generator g-term AND the
                                  # discriminator's own update are zeroed
                                  # below this step — adopt_weight
                                  # semantics, vqperceptual.py:13-16)
    adaptive_g_weight: bool = False
                                  # rescale the g-term by
                                  # ||∂nll/∂last|| / ||∂g/∂last|| clamped
                                  # to [0, 1e4] (calculate_adaptive_weight,
                                  # vqperceptual.py:67-78; last = the
                                  # decoder conv_out kernel, model.py:403)


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray):
    loss_real = jnp.mean(nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray):
    return 0.5 * (jnp.mean(nn.softplus(-logits_real))
                  + jnp.mean(nn.softplus(logits_fake)))


def generator_loss(x, x_rec, p_loss, logits_fake, codebook_loss,
                   cfg: LossConfig, g_scale=1.0):
    """Returns (scalar loss, metrics dict). g_scale multiplies the
    adversarial term (disc warmup factor and/or adaptive weight; 1.0
    reproduces the reference's effective constants)."""
    rec_loss = jnp.square(x.astype(jnp.float32) - x_rec.astype(jnp.float32))
    nll_loss = jnp.mean(rec_loss + cfg.perceptual_weight * p_loss)
    g_loss = -jnp.mean(logits_fake.astype(jnp.float32))
    loss = (nll_loss + cfg.g_weight * g_scale * g_loss
            + cfg.codebook_weight * jnp.mean(codebook_loss))
    metrics = {
        "total_loss": loss,
        "quant_loss": jnp.mean(codebook_loss),
        "nll_loss": nll_loss,
        "rec_loss": jnp.mean(rec_loss),
        "p_loss": jnp.mean(p_loss),
        "g_loss": g_loss,
    }
    return loss, metrics


def discriminator_loss(logits_real, logits_fake, cfg: LossConfig):
    fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss
    d_loss = fn(logits_real.astype(jnp.float32),
                logits_fake.astype(jnp.float32))
    metrics = {
        "disc_loss": d_loss,
        "logits_real": jnp.mean(logits_real),
        "logits_fake": jnp.mean(logits_fake),
    }
    return d_loss, metrics
