"""Data-parallel scaling harness: train-step throughput at 1..N devices.

On a real pod slice this measures the ICI scaling efficiency north-star
(BASELINE.md: >=85% to 2 hosts). On this dev box it runs on the virtual CPU
mesh — useful as a correctness/regression harness for the sharded step, not
as a performance statement (virtual devices share 2 physical cores).

Usage: python tools/scaling_check.py [--devices 1 2 4 8] [--steps 3]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--per-device-batch", type=int, default=1)
    p.add_argument("--cpu", action="store_true",
                   help="force the virtual CPU mesh (default if no TPU)")
    args = p.parse_args()

    import jax
    if args.cpu or True:  # only CPU multi-device exists on this box
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(args.devices))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(f"~/.cache/jax_cache_{jax.default_backend()}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np
    from control_gic_tpu.models.cgic import CGICConfig
    from control_gic_tpu.parallel.mesh import data_sharding, make_mesh, shard_batch
    from control_gic_tpu.train import TrainConfig, Trainer, create_train_state

    cfg = CGICConfig(n_embed=64, embed_dim=4, z_channels=4, ch=32,
                     ch_mult=(1, 1, 2, 2, 2), num_res_blocks=1,
                     attn_resolutions=(8,), resolution=64)
    tcfg = TrainConfig()
    rng = np.random.default_rng(0)

    results = {}
    for n in args.devices:
        mesh = make_mesh(n)
        trainer = Trainer(cfg, tcfg, mesh=mesh,
                          data_sharding=data_sharding(mesh))
        state = create_train_state(jax.random.PRNGKey(0), cfg, tcfg,
                                   image_size=64)
        bsz = n * args.per_device_batch
        x = shard_batch(mesh, rng.uniform(-1, 1, (bsz, 64, 64, 3))
                        .astype(np.float32))
        state, m = trainer.train_step(state, x)      # compile + warmup
        jax.block_until_ready(state.gen_params)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = trainer.train_step(state, x)
        jax.block_until_ready(state.gen_params)
        dt = (time.perf_counter() - t0) / args.steps
        ips = bsz / dt
        results[n] = ips
        base = results[min(results)]
        eff = ips / (base * n / min(results))
        print(f"devices={n}: {ips:8.2f} img/s  "
              f"scaling_eff={eff:5.1%} (vs {min(results)}-dev linear)")


if __name__ == "__main__":
    main()
