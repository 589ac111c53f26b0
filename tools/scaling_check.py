"""Data-parallel scaling harness: train-step throughput at 1..N devices.

On a real pod slice this measures the ICI scaling efficiency north-star
(BASELINE.md: >=85% to 2 hosts). On this dev box it runs on the virtual CPU
mesh — useful as a correctness/regression harness for the sharded step, not
as a performance statement (virtual devices share 2 physical cores).

--multiproc additionally runs the TWO-PROCESS jax.distributed form (the
2-host pod simulation): 1 process x 2 devices vs 2 processes x 1 device,
same global batch, same fused train step, gradient/counter psums crossing
the process boundary. The reported efficiency isolates the multi-process
mechanism overhead (distributed init, cross-process collectives, global
array assembly) at equal physical core count — honest label: CPU-mesh
mechanism evidence for the >=85%-to-2-hosts target, not TPU performance.

Usage: python tools/scaling_check.py [--devices 1 2 4 8] [--steps 3]
       python tools/scaling_check.py --multiproc [--steps 10]
"""
import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_MP_WORKER = r'''
import os, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(sys.argv[2]))
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

pid = int(sys.argv[1])
nloc = int(sys.argv[2])
nproc = int(sys.argv[3])
steps = int(sys.argv[4])
port = sys.argv[5]
if nproc > 1:
    from control_gic_tpu.parallel.multihost import initialize_multihost
    initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=nproc, process_id=pid)

from control_gic_tpu.models.cgic import CGICConfig
from control_gic_tpu.parallel.mesh import (data_sharding, make_mesh,
                                           replicated_sharding)
from control_gic_tpu.train import TrainConfig, Trainer, create_train_state

cfg = CGICConfig(n_embed=64, embed_dim=4, z_channels=4, ch=32,
                 ch_mult=(1, 1, 2, 2, 2), num_res_blocks=1,
                 attn_resolutions=(8,), resolution=64)
tcfg = TrainConfig()
mesh = make_mesh()              # all global devices
trainer = Trainer(cfg, tcfg, mesh=mesh, data_sharding=data_sharding(mesh))
state = create_train_state(jax.random.PRNGKey(0), cfg, tcfg, image_size=64)
state = jax.tree.map(lambda a: np.asarray(a), state)
state = jax.device_put(state, replicated_sharding(mesh))

rng = np.random.default_rng(42)
per_dev = int(os.environ.get("MP_PER_DEV", "1"))
gbatch = jax.device_count() * per_dev
local = rng.uniform(-1, 1, (nloc * per_dev, 64, 64, 3)).astype(np.float32)
if nproc > 1:
    x = jax.make_array_from_process_local_data(
        data_sharding(mesh), local, (gbatch, 64, 64, 3))
else:
    x = jax.device_put(rng.uniform(-1, 1, (gbatch, 64, 64, 3))
                       .astype(np.float32), data_sharding(mesh))

state, m = trainer.train_step(state, x)        # compile + warm
jax.block_until_ready(state.gen_params)
t0 = time.perf_counter()
for _ in range(steps):
    state, m = trainer.train_step(state, x)
jax.block_until_ready(state.gen_params)
dt = (time.perf_counter() - t0) / steps
print(f"RESULT pid={pid} ips={gbatch/dt:.4f} step_ms={dt*1e3:.1f} "
      f"counters={int(jax.device_get(state.codebook_counts).sum())}")
'''


def run_multiproc(steps: int, per_dev_sweep=None) -> None:
    import tempfile
    here = os.path.dirname(os.path.abspath(__file__))
    fd, worker = tempfile.mkstemp(suffix="_mp_worker.py")
    with os.fdopen(fd, "w") as f:
        f.write(_MP_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(here)

    def fresh_port():
        # Bind an ephemeral port and release it for the coordinator: a
        # fixed pid-derived port can collide with an in-use socket (or a
        # stale coordinator from a killed run) and hang distributed init
        # until the 900 s subprocess timeout.
        import socket
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return str(s.getsockname()[1])

    def launch(nloc, nproc, per_dev=1):
        env["MP_PER_DEV"] = str(per_dev)
        port = fresh_port()
        procs = [subprocess.Popen(
            [sys.executable, worker, str(i), str(nloc), str(nproc),
             str(steps), port], stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, env=env) for i in range(nproc)]
        outs = [p.communicate(timeout=1800)[0].decode() for p in procs]
        for p, o in zip(procs, outs):
            assert p.returncode == 0, o[-2000:]
        ips = [float(line.split("ips=")[1].split()[0])
               for o in outs for line in o.splitlines()
               if line.startswith("RESULT")]
        return ips

    try:
        if per_dev_sweep:
            # Asymptote sweep: the cross-process overhead (distributed
            # init, collectives, global array assembly) is per-STEP, so
            # efficiency vs the single-process baseline must rise toward
            # 1 as per-device batch grows. Table goes to STATUS.md.
            print("per-dev-batch  1proc_img/s  2proc_img/s  efficiency")
            for pd in per_dev_sweep:
                base = launch(2, 1, per_dev=pd)[0]
                two = launch(1, 2, per_dev=pd)[0]
                print(f"{pd:13d}  {base:11.3f}  {two:11.3f}  "
                      f"{two / base:9.1%}", flush=True)
            print("NOTE: CPU-mesh mechanism evidence (2 cores shared), "
                  "not a TPU performance statement.")
            return
        print("1 process x 2 devices (baseline)...")
        base = launch(2, 1)[0]
        print(f"  {base:.3f} img/s")
        print("2 processes x 1 device (jax.distributed)...")
        two = launch(1, 2)
        print(f"  {two[0]:.3f} img/s (proc reports: {two})")
        eff = two[0] / base
        print(f"two-process efficiency vs single-process at equal "
              f"devices: {eff:.1%}")
        print("NOTE: CPU-mesh mechanism evidence (2 cores shared), not a "
              "TPU performance statement.")
    finally:
        os.remove(worker)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--per-device-batch", type=int, default=1)
    p.add_argument("--cpu", action="store_true",
                   help="force the virtual CPU mesh (default if no TPU)")
    p.add_argument("--multiproc", action="store_true",
                   help="two-process jax.distributed vs single-process "
                        "at equal device count")
    p.add_argument("--per-dev-sweep", type=int, nargs="+", default=None,
                   help="with --multiproc: sweep per-device batch sizes "
                        "and print the efficiency asymptote table")
    args = p.parse_args()

    if args.multiproc:
        run_multiproc(args.steps, per_dev_sweep=args.per_dev_sweep)
        return

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
