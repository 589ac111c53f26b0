"""On-TPU validation + honest benchmark of Pallas flash attention vs XLA.

Timing methodology: all iterations run inside ONE jitted lax.scan that
chains each output into the next query (distinct values every step, single
dispatch, single scalar fetch) — immune to the runtime's execution-dedup
and async-completion quirks that inflate naive host loops on this box.

Run on a TPU host: python tools/attn_check.py
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


def scan_bench(fn, q0, k, v, iters):
    @jax.jit
    def run(q0, k, v):
        def body(q, _):
            o = fn(q, k, v)
            return o.astype(q.dtype), None
        o, _ = jax.lax.scan(body, q0, None, length=iters)
        return jnp.sum(o.astype(jnp.float32))

    float(run(q0 + 1.0, k, v))          # compile+warm on distinct input
    t0 = time.perf_counter()
    float(run(q0, k, v))                # data fetch forces completion
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(f"~/.cache/jax_cache_{jax.default_backend()}"))
    rng = np.random.default_rng(0)
    shapes = [
        (8, 1024, 512, jnp.bfloat16),   # decoder trunk attn @32^2, batch 8
        (8, 4096, 512, jnp.bfloat16),   # decoder/encoder mids @64^2
        (1, 36864, 512, jnp.bfloat16),  # 768px tile latent (192^2 tokens)
        (8, 4096, 512, jnp.float32),
    ]
    for (b, t, c, dt) in shapes:
        q = jnp.asarray(rng.normal(size=(b, t, c)), dt)
        k = jnp.asarray(rng.normal(size=(b, t, c)), dt)
        v = jnp.asarray(rng.normal(size=(b, t, c)), dt)

        ox = np.asarray(attention_xla(q, k, v), np.float32)
        of = np.asarray(attention_flash(q, k, v), np.float32)
        rel = np.abs(ox - of).max() / max(np.abs(ox).max(), 1e-9)
        assert rel < 2e-2, f"flash mismatch rel={rel:.3e}"

        flops = 4.0 * b * t * t * c
        for name, fn in [("xla", attention_xla), ("flash", attention_flash)]:
            dt_s = scan_bench(fn, q, k, v, ITERS)
            print(f"[{b}x{t}x{c} {jnp.dtype(dt).name}] {name:6s}: "
                  f"{dt_s * 1e3:8.2f} ms  {flops / dt_s / 1e12:6.1f} TFLOP/s"
                  f"  (rel err {rel:.1e})")


if __name__ == "__main__":
    main()
