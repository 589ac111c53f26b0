"""Training CLI (counterpart of reference main.py + config_train.yaml).

Reference recipe (config_train.yaml, model.py:192-204): Adam lr 5e-5 betas
(0.5, 0.9), grad clip-by-value 1.0, EMA 0.9999, batch 2/device, 256x256
center-crop [-1,1] images, validation every 2000 steps, checkpoint every
2000 steps. Data parallelism = batch sharded over the device mesh (the
TPU-native replacement for Lightning DDP/NCCL).

Failure detection / elastic recovery (SURVEY §5 — the reference has none;
a crash loses up to 2000 steps and needs a manual restart, main.py:130-134):
  - SIGTERM/SIGINT (preemption) finishes the in-flight step, writes a
    synchronous checkpoint, and exits cleanly.
  - Non-finite losses are detected at log steps and raised as faults.
  - Faults restore from the latest checkpoint and continue, up to
    --max-restarts times (in-process elastic recovery; a fresh process with
    --resume recovers identically).

Usage:
  python -m control_gic_tpu.cli.train --train-dir <imgs> [--val-dir <imgs>]
      [--steps 165000] [--batch-size 8] [--ckpt-dir ./all_saves]
      [--val-every 2000] [--ckpt-every 2000] [--log-every 30]
"""
from __future__ import annotations

import argparse
import math
import signal
import threading
import time

import jax
import numpy as np

from ..data import ImageFolderDataset, prefetch_batches
from ..models.cgic import CGICConfig
from ..parallel.mesh import (data_sharding, make_mesh, replicated_sharding,
                             shard_batch)
from ..train import TrainConfig, Trainer, create_train_state
from ..utils.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from ..utils.logging import ImageLogger, MetricLogger, log_schedule_hit
from .common import enable_compilation_cache


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default=None,
                   help="YAML config (configs/train.yaml); CLI flags "
                        "override its trainer/data entries")
    p.add_argument("--train-dir", type=str, required=True)
    p.add_argument("--val-dir", type=str, default=None)
    p.add_argument("--steps", type=int, default=165_000)
    p.add_argument("--batch-size", type=int, default=8,
                   help="global batch (reference: 2 x 4 GPUs)")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--ratios", type=float, nargs=2, default=(0.1, 0.4))
    p.add_argument("--ckpt-dir", type=str, default="./all_saves")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--val-every", type=int, default=2000)
    p.add_argument("--ckpt-every", type=int, default=2000)
    p.add_argument("--log-every", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize blocks under grad (fit the 130M "
                        "config at batch>=4 on one chip)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--log-dir", type=str, default="./logs")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN/Inf; "
                        "SURVEY §5 — the reference has no sanitizers)")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="write a jax.profiler trace of steps 10..20 here")
    p.add_argument("--max-restarts", type=int, default=3,
                   help="auto-restore from the latest checkpoint and "
                        "continue after a training fault, this many times")
    return p


class TrainFault(RuntimeError):
    """A recoverable training failure (non-finite loss, device error)."""


def _install_preemption_handler() -> threading.Event:
    """SIGTERM/SIGINT set the flag; the loop checkpoints and exits cleanly.
    A second signal falls through to the default handler (hard kill)."""
    flag = threading.Event()

    def _handler(signum, frame):
        if flag.is_set():
            signal.signal(signum, signal.SIG_DFL)
            signal.raise_signal(signum)
        print(f"signal {signum}: finishing step, checkpointing, exiting")
        flag.set()

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _handler)
        except ValueError:  # non-main thread (tests)
            pass
    return flag


def main(argv=None):
    args = get_parser().parse_args(argv)
    enable_compilation_cache()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    # Supervised restart loop: any fault below restores from the latest
    # checkpoint (or from scratch if none exists yet) and continues.
    attempt = 0
    while True:
        try:
            return _run(args, resume=args.resume or attempt > 0,
                        attempt=attempt)
        except (TrainFault, jax.errors.JaxRuntimeError) as e:
            attempt += 1
            if attempt > args.max_restarts:
                raise
            print(f"training fault ({type(e).__name__}: {e}); "
                  f"restarting from latest checkpoint "
                  f"[{attempt}/{args.max_restarts}]")


def _run(args, resume: bool, attempt: int = 0):
    mesh = make_mesh()
    n_dev = mesh.devices.size
    assert args.batch_size % n_dev == 0, (args.batch_size, n_dev)
    print(f"devices={n_dev} global_batch={args.batch_size}")

    if args.config:
        import dataclasses
        from ..config import load_config
        run_cfg = load_config(args.config)
        model_cfg = dataclasses.replace(
            run_cfg.model, resolution=args.image_size,
            remat=args.remat or run_cfg.model.remat)
        train_cfg = dataclasses.replace(run_cfg.train,
                                        coarse_ratio=args.ratios[0],
                                        medium_ratio=args.ratios[1])
    else:
        model_cfg = CGICConfig(resolution=args.image_size, dtype=args.dtype,
                               remat=args.remat)
        train_cfg = TrainConfig(learning_rate=args.lr,
                                coarse_ratio=args.ratios[0],
                                medium_ratio=args.ratios[1])
    trainer = Trainer(model_cfg, train_cfg, mesh=mesh,
                      data_sharding=data_sharding(mesh))

    state = create_train_state(jax.random.PRNGKey(args.seed), model_cfg,
                               train_cfg, image_size=args.image_size)
    start = 0
    if resume and latest_step(args.ckpt_dir) is not None:
        state = restore_checkpoint(args.ckpt_dir, template=state)
        # orbax restores committed to one device; the train step expects
        # replicated state next to the mesh-sharded batch
        state = jax.device_put(state, replicated_sharding(mesh))
        start = int(state.step)
        print(f"resumed from step {start}")
    preempted = _install_preemption_handler()

    train_ds = ImageFolderDataset(args.train_dir, args.image_size)
    print(f"train images: {len(train_ds)}")
    # Resume continues the data stream at the checkpointed step (per-epoch
    # shuffle is a pure function of (seed, epoch) — see prefetch_batches).
    # A restart with NO checkpoint would replay the identical stream into a
    # deterministic early fault, so those attempts bump the shuffle seed.
    data_seed = args.seed
    if attempt and start == 0:
        data_seed = args.seed + attempt
        print(f"restart from scratch (no checkpoint): shuffle seed "
              f"{args.seed} -> {data_seed} to avoid replaying a "
              f"deterministic fault")
    batches = prefetch_batches(train_ds, args.batch_size, shuffle=True,
                               seed=data_seed, start_step=start)
    val_batches = None
    if args.val_dir:
        val_ds = ImageFolderDataset(args.val_dir, args.image_size)
        val_batches = [val_ds[i] for i in range(min(16, len(val_ds)))]

    metric_log = MetricLogger(args.log_dir, use_wandb=args.wandb)
    image_log = ImageLogger(args.log_dir)

    t0 = time.time()
    seen = 0
    for step, batch in enumerate(batches, start=start):
        if step >= args.steps:
            break
        if args.profile_dir and step == start + 10:
            jax.profiler.start_trace(args.profile_dir)
        x = shard_batch(mesh, batch)
        state, metrics = trainer.train_step(state, x)
        seen += batch.shape[0]
        if args.profile_dir and step == start + 20:
            jax.block_until_ready(state.gen_params)
            jax.profiler.stop_trace()

        if step % args.log_every == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            if not all(math.isfinite(v) for v in metrics.values()):
                bad = [k for k, v in metrics.items()
                       if not math.isfinite(v)]
                raise TrainFault(f"non-finite metrics at step {step}: {bad}")
            ips = seen / (time.time() - t0 + 1e-9)
            metric_log.log(step, {**metrics, "images_per_sec": ips})
            print(f"step {step}: "
                  + " ".join(f"{k.split('/')[-1]}={v:.4f}"
                             for k, v in sorted(metrics.items()))
                  + f" ({ips:.2f} img/s)")
        if preempted.is_set():
            save_checkpoint(args.ckpt_dir, int(state.step), state, wait=True)
            print(f"preemption checkpoint @ {int(state.step)} — exiting")
            return
        if log_schedule_hit(step):
            rec, gi = trainer.recon_step(state, x)
            image_log.log(step, np.asarray(batch), np.asarray(rec),
                          np.asarray(gi))
        if val_batches and step and step % args.val_every == 0:
            vx = shard_batch(mesh, np.stack(val_batches[:args.batch_size]))
            vm = {k: float(v) for k, v in trainer.eval_step(state, vx).items()}
            print(f"  val @ {step}: "
                  + " ".join(f"{k.split('/')[-1]}={v:.4f}"
                             for k, v in sorted(vm.items())))
        if step and step % args.ckpt_every == 0:
            save_checkpoint(args.ckpt_dir, step, state)
            print(f"  checkpoint @ {step}")

    save_checkpoint(args.ckpt_dir, int(state.step), state, wait=True)
    print("done")


if __name__ == "__main__":
    main()
