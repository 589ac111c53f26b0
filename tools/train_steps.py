"""Multi-step full-scale training evidence on the attached chip.

Runs O(100s) of fused generator+discriminator train steps of the flagship
130M-param config (bf16, remat) on procedural synthetic data (smooth random
fields — structured enough for the reconstruction loss to actually fall),
then validates checkpoint save -> restore byte-stability and continuation.

python tools/train_steps.py
  env: TS_BATCH=4 TS_STEPS=200 TS_LOG_EVERY=10 TS_CKPT_DIR=/tmp/ts_ckpt
       TS_DISC_START=0 TS_ADAPTIVE=0   (opt-in GAN schedule knobs — the
       round-5 recipe run uses TS_DISC_START=1000 TS_ADAPTIVE=1 to show
       rec_loss keeps improving after the discriminator engages)

Reference training-loop semantics: /root/reference/CGIC/models/model.py:155-204
(165k-step recipe, configs/config_train.yaml:4-16). This tool is the
shortened-horizon evidence run VERDICT.md round-1 item 5 asks for; numbers
are recorded in docs/STATUS.md.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def procedural_batch(rng: np.random.Generator, b: int, size: int) -> np.ndarray:
    """Smooth random fields in [-1, 1]: low-res noise, bicubic-ish upsample
    (FFT low-pass), random per-channel affine. Learnable structure without
    any dataset access."""
    lo = rng.normal(size=(b, size // 16, size // 16, 3)).astype(np.float32)
    up = lo.repeat(16, axis=1).repeat(16, axis=2)
    # cheap separable smoothing
    k = np.ones(9, np.float32) / 9.0
    up = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), 1, up)
    up = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), 2, up)
    gain = rng.uniform(0.5, 1.5, (b, 1, 1, 3)).astype(np.float32)
    img = np.tanh(up * gain)
    return img


def tree_equal(a, b) -> bool:
    import jax
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(f"~/.cache/jax_cache_{jax.default_backend()}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from control_gic_tpu.models.cgic import CGICConfig
    from control_gic_tpu.train import TrainConfig, Trainer, create_train_state
    from control_gic_tpu.utils.checkpoint import (restore_checkpoint,
                                                  save_checkpoint)

    B = int(os.environ.get("TS_BATCH", "4"))
    N = int(os.environ.get("TS_STEPS", "200"))
    log_every = int(os.environ.get("TS_LOG_EVERY", "10"))
    ckpt_dir = os.environ.get("TS_CKPT_DIR", "/tmp/ts_ckpt")
    size = int(os.environ.get("TS_SIZE", "256"))

    disc_start = int(os.environ.get("TS_DISC_START", "0"))
    adaptive = os.environ.get("TS_ADAPTIVE", "0") == "1"
    cfg = CGICConfig(dtype="bfloat16", remat=True)
    tcfg = TrainConfig()
    if disc_start or adaptive:
        import dataclasses

        from control_gic_tpu.train.losses import LossConfig
        tcfg = dataclasses.replace(tcfg, loss=LossConfig(
            disc_start=disc_start, adaptive_g_weight=adaptive))
        print(f"GAN schedule: disc_start={disc_start} adaptive={adaptive}")
    trainer = Trainer(cfg, tcfg)
    state = create_train_state(jax.random.PRNGKey(0), cfg, tcfg,
                               image_size=size)
    n_params = sum(int(np.prod(np.shape(v)))
                   for v in jax.tree_util.tree_leaves(state.gen_params))
    print(f"config: {n_params:,} gen params, batch {B}, {N} steps, {size}px")

    rng = np.random.default_rng(0)
    # distinct pre-generated batches (also defeats any runtime dedupe)
    data = [jnp.asarray(procedural_batch(rng, B, size)) for _ in range(32)]

    t0 = time.time()
    state, m = trainer.train_step(state, data[0])
    jax.block_until_ready(m["train/aeloss"])
    print(f"compile+step1: {time.time() - t0:.1f}s")

    history = []
    t0 = time.perf_counter()
    for i in range(1, N):
        state, m = trainer.train_step(state, data[i % len(data)])
        if i % log_every == 0 or i == N - 1:
            row = {k: float(v) for k, v in m.items()}
            row["step"] = i + 1
            history.append(row)
            print(f"step {i+1:4d}  rec={row['train/rec_loss']:.4f} "
                  f"ae={row['train/aeloss']:.4f} "
                  f"disc={row['train/discloss']:.4f} "
                  f"quant={row['train/quant_loss']:.4f}")
    dt = time.perf_counter() - t0
    print(f"steady-state: {dt / (N - 1) * 1e3:.1f} ms/step, "
          f"{B * (N - 1) / dt:.2f} img/s training throughput")

    # loss trend: mean of first vs last quarter of the logged history
    q = max(1, len(history) // 4)
    first = np.mean([h["train/rec_loss"] for h in history[:q]])
    last = np.mean([h["train/rec_loss"] for h in history[-q:]])
    print(f"rec_loss trend: first-quarter mean {first:.4f} -> "
          f"last-quarter mean {last:.4f} "
          f"({'DECREASING ok' if last < first else 'NOT decreasing'})")

    # ---- checkpoint byte-stability: save -> restore -> compare bitwise
    if os.path.isdir(ckpt_dir):
        shutil.rmtree(ckpt_dir)
    saved_step = int(state.step)
    t0 = time.time()
    save_checkpoint(ckpt_dir, saved_step, state, wait=True)
    print(f"checkpoint save ({saved_step}): {time.time() - t0:.1f}s")
    restored = restore_checkpoint(ckpt_dir, saved_step, template=state)
    ok = tree_equal(state, restored)
    print(f"restore bitwise-identical: {ok}")
    assert ok, "checkpoint round-trip changed state bytes"

    # ---- continue training from the restored state
    restored_state, m2 = trainer.train_step(restored, data[0])
    assert int(restored_state.step) == saved_step + 1
    assert all(np.isfinite(float(v)) for v in m2.values())
    print(f"continuation from restore: step {int(restored_state.step)}, "
          f"ae={float(m2['train/aeloss']):.4f} — ok")

    out = {"params": n_params, "batch": B, "steps": N,
           "ms_per_step": round(dt / (N - 1) * 1e3, 1),
           "train_img_s": round(B * (N - 1) / dt, 2),
           "rec_first_q": round(float(first), 4),
           "rec_last_q": round(float(last), 4),
           "restore_bitwise": ok,
           "history": history}
    path = os.environ.get("TS_OUT", "/tmp/train_steps.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
