"""Jitted training / validation steps.

One fused step per batch computes both updates the reference performs as two
Lightning optimizer passes (model.py:155-174):
  1. generator update: MSE + LPIPS + 0.1*(-mean D(x̂)) + codebook loss
  2. discriminator update: hinge(D(x), D(sg(x̂)))
The reconstruction is computed once and reused. Semantics deviation, on
purpose: Lightning's second optimizer pass re-runs the forward AFTER the
generator update, so the reference discriminator sees the post-update
reconstruction; the fused step feeds it the pre-update one (one half-step of
staleness on the discriminator's input — see docs/DESIGN.md). Fusing halves
the forward cost and is the TPU-idiomatic formulation.
Codebook-usage counters accumulate via bincount
on-device (vs the reference's per-token Python loop, quantize.py:79-81).

Data parallelism: `Trainer.jit_step` accepts shardings; with a batch sharded
over the mesh 'data' axis and replicated state, jit inserts the gradient
all-reduces automatically (XLA psum over ICI) — the TPU equivalent of
Lightning-DDP/NCCL (config_train.yaml:9-12).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.cgic import CGIC, CGICConfig
from ..models.discriminator import NLayerDiscriminator
from ..models.lpips import LPIPS
from .losses import discriminator_loss, generator_loss
from .state import TrainConfig, TrainState, ema_update, make_optimizer


class Trainer:
    """Binds the three modules + config into jitted step functions."""

    def __init__(self, model_cfg: CGICConfig, train_cfg: TrainConfig,
                 mesh=None, data_sharding=None):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.model = CGIC(model_cfg)
        self.disc = NLayerDiscriminator(
            axis_name=None)  # per-replica BatchNorm, like reference DDP
        self.lpips = LPIPS()
        self.opt = make_optimizer(train_cfg)

        kwargs = {}
        if mesh is not None and data_sharding is not None:
            kwargs = dict(
                in_shardings=(None, data_sharding),
                out_shardings=(None, None),
                donate_argnums=(0,),
            )
        self.train_step = jax.jit(self._train_step, **kwargs)
        self.eval_step = jax.jit(self._eval_step)
        self.recon_step = jax.jit(self._recon_step)

    def _recon_step(self, state: TrainState, x: jnp.ndarray):
        """Reconstruction + partition map for image logging."""
        cfg = self.train_cfg
        rec, enc = self.model.apply(
            {"params": state.gen_params}, x, cfg.coarse_ratio,
            cfg.medium_ratio)
        return rec, enc.grain_indices

    # ------------------------------------------------------------------ step

    def _forward_losses(self, gen_params, disc_vars, lpips_params, x,
                        g_scale=1.0):
        cfg = self.train_cfg
        rec, enc = self.model.apply(
            {"params": gen_params}, x, cfg.coarse_ratio, cfg.medium_ratio)
        p_loss = jnp.mean(self.lpips.apply(
            {"params": lpips_params}, rec, x,
            normalize=cfg.loss.lpips_normalize))
        logits_fake = self.disc.apply(disc_vars, rec, train=False)
        loss, metrics = generator_loss(
            x, rec, p_loss, logits_fake, enc.emb_loss, cfg.loss,
            g_scale=g_scale)
        return loss, (rec, enc, metrics)

    def _adaptive_g_weight(self, gen_params, disc_vars, lpips_params, x):
        """The reference's calculate_adaptive_weight
        (vqperceptual.py:67-78): ||∂nll/∂w|| / (||∂g/∂w|| + 1e-4) clamped
        to [0, 1e4], with w = the decoder conv_out kernel (the "last
        layer", model.py:403-404). Two extra backward passes, restricted
        to scalar outputs — only paid when cfg.loss.adaptive_g_weight."""
        cfg = self.train_cfg

        def both_losses(kernel):
            params = jax.tree_util.tree_map(lambda p: p, gen_params)
            params["decoder"]["conv_out"]["kernel"] = kernel
            rec, _ = self.model.apply(
                {"params": params}, x, cfg.coarse_ratio, cfg.medium_ratio)
            p_loss = jnp.mean(self.lpips.apply(
                {"params": lpips_params}, rec, x,
                normalize=cfg.loss.lpips_normalize))
            rec_l = jnp.square(x.astype(jnp.float32)
                               - rec.astype(jnp.float32))
            nll = jnp.mean(rec_l + cfg.loss.perceptual_weight * p_loss)
            g = -jnp.mean(self.disc.apply(disc_vars, rec,
                                          train=False).astype(jnp.float32))
            return jnp.stack([nll, g])

        kernel = gen_params["decoder"]["conv_out"]["kernel"]
        g_nll, g_g = jax.jacrev(both_losses)(kernel)
        w = (jnp.linalg.norm(g_nll.reshape(-1))
             / (jnp.linalg.norm(g_g.reshape(-1)) + 1e-4))
        return jax.lax.stop_gradient(jnp.clip(w, 0.0, 1e4))

    def _train_step(self, state: TrainState, x: jnp.ndarray
                    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        cfg = self.train_cfg
        disc_vars = {"params": state.disc_params,
                     "batch_stats": state.disc_batch_stats}

        # ---- adversarial-term scale: disc warmup x adaptive weight
        # (both 1.0 by default — the reference's effective constants)
        g_scale = 1.0
        if cfg.loss.disc_start > 0:
            g_scale = jnp.where(state.step >= cfg.loss.disc_start, 1.0, 0.0)
        if cfg.loss.adaptive_g_weight:
            g_scale = g_scale * self._adaptive_g_weight(
                state.gen_params, disc_vars, state.lpips_params, x)

        # ---- generator update
        grad_fn = jax.value_and_grad(self._forward_losses, has_aux=True)
        (g_loss, (rec, enc, g_metrics)), g_grads = grad_fn(
            state.gen_params, disc_vars, state.lpips_params, x, g_scale)
        updates, opt_gen = self.opt.update(g_grads, state.opt_gen,
                                           state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates)

        # ---- discriminator update (reconstruction detached)
        rec_sg = jax.lax.stop_gradient(rec)

        def disc_loss_fn(disc_params):
            dvars = {"params": disc_params,
                     "batch_stats": state.disc_batch_stats}
            logits_real, mutated = self.disc.apply(
                dvars, x, train=True, mutable=["batch_stats"])
            dvars2 = {"params": disc_params,
                      "batch_stats": mutated["batch_stats"]}
            logits_fake, mutated2 = self.disc.apply(
                dvars2, rec_sg, train=True, mutable=["batch_stats"])
            loss, metrics = discriminator_loss(logits_real, logits_fake,
                                               cfg.loss)
            if cfg.loss.disc_start > 0:   # adopt_weight on d_loss too
                loss = loss * jnp.where(state.step >= cfg.loss.disc_start,
                                        1.0, 0.0)
            return loss, (mutated2["batch_stats"], metrics)

        (d_loss, (new_stats, d_metrics)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params)
        d_updates, opt_disc = self.opt.update(d_grads, state.opt_disc,
                                              state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # ---- EMA + counters
        ema_params, ema_n = ema_update(
            state.ema_params, gen_params, state.ema_num_updates,
            cfg.ema_decay)
        counts = state.codebook_counts + enc.counts.astype(jnp.uint32)

        metrics = {f"train/{k}": v for k, v in {**g_metrics,
                                                **d_metrics}.items()}
        metrics["train/aeloss"] = g_loss
        metrics["train/discloss"] = d_loss

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            disc_batch_stats=new_stats,
            opt_gen=opt_gen,
            opt_disc=opt_disc,
            ema_params=ema_params,
            ema_num_updates=ema_n,
            codebook_counts=counts,
        )
        return new_state, metrics

    def _eval_step(self, state: TrainState, x: jnp.ndarray
                   ) -> Dict[str, jnp.ndarray]:
        disc_vars = {"params": state.disc_params,
                     "batch_stats": state.disc_batch_stats}
        _, (rec, enc, g_metrics) = self._forward_losses(
            state.gen_params, disc_vars, state.lpips_params, x)
        logits_real = self.disc.apply(disc_vars, x, train=False)
        logits_fake = self.disc.apply(disc_vars, rec, train=False)
        _, d_metrics = discriminator_loss(logits_real, logits_fake,
                                          self.train_cfg.loss)
        out = {f"val/{k}": v for k, v in {**g_metrics, **d_metrics}.items()}
        out["val/psnr"] = -10.0 * jnp.log10(
            jnp.mean(jnp.square(rec - x)) / 4.0 + 1e-12)  # [-1,1] range
        return out
