"""On-TPU validation of the Pallas flash attention vs the XLA einsum path:
correctness at the codec's real token counts and a micro-benchmark.

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


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    for (b, t, c) in [(1, 4096, 512)]:
        q = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)

        fx = jax.jit(attention_xla)
        ff = jax.jit(attention_flash)
        ox = np.asarray(fx(q, k, v))
        of = np.asarray(ff(q, k, v))
        err = np.abs(ox - of).max()
        rel = err / max(np.abs(ox).max(), 1e-9)
        print(f"[{b}x{t}x{c}] max abs err {err:.3e} (rel {rel:.3e})")
        # On TPU both paths run f32 matmuls at default MXU precision
        # (bf16-truncated inputs, f32 accumulate), so they agree only to
        # bf16 input precision (~4e-3 rel), not f32.
        assert rel < 2e-2, "flash attention mismatch"

        # micro-bench with distinct inputs (runtime dedupes repeats)
        qs = [jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
              for _ in range(6)]
        for name, fn in [("xla", fx), ("flash", ff)]:
            fn(qs[0], k, v).block_until_ready()
            t0 = time.perf_counter()
            outs = [fn(qs[i], k, v) for i in range(1, 6)]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / 5
            flops = 4.0 * b * t * t * c
            print(f"  {name:6s}: {dt*1e3:7.2f} ms  "
                  f"{flops/dt/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
