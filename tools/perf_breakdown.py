"""On-chip encode/decode split timing via in-graph iteration.

All iterations run inside one jitted lax.scan (single dispatch, single
result fetch), so the numbers are pure device time — immune to the
runtime's execution dedup / async-completion quirks that break host-side
loops on this box.

Run: python tools/perf_breakdown.py   (TPU; takes ~15 min of compiles)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed_scan(name, fn, n_iter, batch):
    # NOTE: block_until_ready returns early on this runtime; only an actual
    # device->host data fetch (float()) reliably waits for the computation.
    t0 = time.perf_counter()
    _ = float(fn())
    dt = time.perf_counter() - t0
    per = dt / n_iter
    print(f"{name:12s}: {per * 1e3:8.2f} ms/iter  "
          f"{batch / per:8.2f} img/s  (total {dt:.2f}s)")
    return per


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(f"~/.cache/jax_cache_{jax.default_backend()}"))

    from control_gic_tpu.models import CGIC, CGICConfig
    from control_gic_tpu.models.cgic import CGIC as M

    B = int(os.environ.get("BENCH_BATCH", "8"))
    K = int(os.environ.get("BENCH_ITERS", "8"))
    cfg = CGICConfig(dtype="bfloat16")
    model = CGIC(cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, 0.1, 0.4)
    xs = jnp.asarray(rng.uniform(0, 1, (K, B, 256, 256, 3)), jnp.float32)
    xs_warm = jnp.asarray(rng.uniform(0, 1, (K, B, 256, 256, 3)), jnp.float32)

    @jax.jit
    def encode_scan(v, xs):
        def body(acc, x):
            enc = model.apply(v, x, 0.1, 0.4, method=M.encode)
            return acc + jnp.sum(enc.indices), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), xs)
        return acc

    @jax.jit
    def roundtrip_scan(v, xs):
        def body(acc, x):
            rec, enc = model.apply(v, x, 0.1, 0.4)
            return acc + jnp.sum(rec.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), xs)
        return acc

    @jax.jit
    def decode_scan(v, inds, masks):
        def body(acc, ind):
            rec = model.apply(v, ind, masks, method=M.decode_indices)
            return acc + jnp.sum(rec.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), inds)
        return acc

    # prepare decode inputs from one real encode
    enc = jax.jit(lambda v, x: model.apply(v, x, 0.1, 0.4,
                                           method=M.encode))(variables, xs[0])
    masks = tuple(jax.lax.stop_gradient(m) for m in enc.router.masks)
    inds = jnp.stack([enc.indices] * K)

    # distinct values (the runtime dedups repeats of identical executions)
    inds_warm = (inds + 1) % cfg.n_embed

    print(f"batch={B} iters={K}")
    # warmups (compile) on distinct inputs from the timed calls; float()
    # forces completion (see timed_scan note)
    float(encode_scan(variables, xs_warm))
    float(decode_scan(variables, inds_warm, masks))
    float(roundtrip_scan(variables, xs_warm))

    t_enc = timed_scan("encode", lambda: encode_scan(variables, xs), K, B)
    t_dec = timed_scan("decode", lambda: decode_scan(variables, inds, masks),
                       K, B)
    t_rt = timed_scan("roundtrip", lambda: roundtrip_scan(variables, xs),
                      K, B)
    print(f"encode share {t_enc / t_rt:5.1%}  decode share {t_dec / t_rt:5.1%}")


if __name__ == "__main__":
    main()
