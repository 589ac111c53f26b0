"""Block-size sweep for the Pallas flash-attention kernel (run on TPU).

Same scan-based timing as attn_check. Prints ms per call for each
(block_q, block_k) at the codec's hot shape, plus the XLA baseline.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from control_gic_tpu.ops.attention import attention_flash, attention_xla

ITERS = int(os.environ.get("BENCH_ITERS", "8"))


def scan_bench(fn, q0, k, v, iters=ITERS):
    @jax.jit
    def run(q0, k, v):
        def body(q, _):
            return fn(q, k, v).astype(q.dtype), None
        o, _ = jax.lax.scan(body, q0, None, length=iters)
        return jnp.sum(o.astype(jnp.float32))

    float(run(q0 + 1.0, k, v))
    t0 = time.perf_counter()
    float(run(q0, k, v))
    return (time.perf_counter() - t0) / iters


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(f"~/.cache/jax_cache_{jax.default_backend()}"))
    rng = np.random.default_rng(0)
    shapes = [(8, 4096, 512), (1, 36864, 512)]
    blocks = [(512, 512), (1024, 512), (512, 1024), (1024, 1024),
              (2048, 512), (2048, 1024), (4096, 512), (1024, 2048)]
    for (b, t, c) in shapes:
        q = jnp.asarray(rng.normal(size=(b, t, c)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, t, c)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, t, c)), jnp.bfloat16)
        flops = 4.0 * b * t * t * c
        dt = scan_bench(attention_xla, q, k, v)
        print(f"[{b}x{t}x{c}] xla           : {dt*1e3:8.2f} ms "
              f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)
        ref = np.asarray(attention_xla(q, k, v), np.float32)
        for (bq, bk) in blocks:
            if t % bq or t % bk:
                continue
            try:
                fn = lambda q, k, v: attention_flash(q, k, v, bq, bk)
                out = np.asarray(fn(q, k, v), np.float32)
                rel = np.abs(out - ref).max() / np.abs(ref).max()
                assert rel < 2e-2, rel
                dt = scan_bench(fn, q, k, v)
                print(f"[{b}x{t}x{c}] flash {bq:4d}x{bk:<4d}: "
                      f"{dt*1e3:8.2f} ms {flops/dt/1e12:6.1f} TFLOP/s",
                      flush=True)
            except Exception as e:
                print(f"[{b}x{t}x{c}] flash {bq:4d}x{bk:<4d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
