"""Full-model train-step throughput on the attached chip.

python tools/train_bench.py  (env: TB_BATCH=4 TB_REMAT=1 TB_STEPS=4)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser(f"~/.cache/jax_cache_{jax.default_backend()}"))
    from control_gic_tpu.models.cgic import CGICConfig
    from control_gic_tpu.train import TrainConfig, Trainer, create_train_state

    B = int(os.environ.get("TB_BATCH", "4"))
    K = int(os.environ.get("TB_STEPS", "4"))
    remat = os.environ.get("TB_REMAT", "1") == "1"
    cfg = CGICConfig(dtype="bfloat16", remat=remat)
    tcfg = TrainConfig()
    trainer = Trainer(cfg, tcfg)
    state = create_train_state(jax.random.PRNGKey(0), cfg, tcfg, image_size=256)
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.uniform(-1, 1, (B, 256, 256, 3)), jnp.float32)
          for _ in range(K + 1)]

    t0 = time.time()
    state, m = trainer.train_step(state, xs[-1])
    print(f"compile+step1 {time.time()-t0:.1f}s loss={float(m['train/aeloss']):.4f}")

    t0 = time.perf_counter()
    for i in range(K):
        state, m = trainer.train_step(state, xs[i])
    _ = float(m["train/aeloss"])    # fetch forces completion of the chain
    dt = time.perf_counter() - t0
    print(f"train: {dt/K*1e3:.1f} ms/step  {B*K/dt:.2f} img/s "
          f"(batch={B} remat={remat})")

if __name__ == "__main__":
    main()
