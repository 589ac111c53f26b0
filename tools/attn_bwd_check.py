"""On-chip validation + timing of the Pallas flash-attention BACKWARD.

Checks the FlashAttention-2 backward kernels (ops/attention._flash_backward)
against the XLA einsum gradients on the real device, then times a full
grad step (fwd+bwd) with the same chained-scan method as attn_tune (the
axon runtime dedupes repeated identical dispatches, so iterations must be
data-dependent).

Shapes: the training hot shape (b=8, t=4096, c=512) and the 768px-tile
latent (t=36864) where the einsum backward would materialize a 5.4 GB
score matrix — there only the Pallas path is timed.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from control_gic_tpu.ops.attention import _flash_diff, attention_xla

ITERS = int(os.environ.get("BENCH_ITERS", "8"))


def grad_bench(loss_grad, q0, k, v, iters=ITERS):
    @jax.jit
    def run(q0, k, v):
        def body(q, _):
            g = loss_grad(q, k, v)
            return (q + 1e-3 * g.astype(q.dtype)), None
        q, _ = jax.lax.scan(body, q0, None, length=iters)
        return jnp.sum(q.astype(jnp.float32))

    float(run(q0 + 1.0, k, v))  # compile
    t0 = time.perf_counter()
    float(run(q0, k, v))
    return (time.perf_counter() - t0) / iters


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(f"~/.cache/jax_cache_{jax.default_backend()}"))
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

    # --- correctness on-chip (f32, modest shape) ---
    b, t, c = 2, 2048, 512
    q = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    loss_f = lambda q, k, v: jnp.sum(jnp.square(
        _flash_diff(q, k, v, 1024, 512, False)))
    loss_x = lambda q, k, v: jnp.sum(jnp.square(attention_xla(q, k, v)))
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    with jax.default_matmul_precision("highest"):
        ghi = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))(q, k, v)
    # On TPU, default-precision f32 matmuls decompose into bf16 passes, so
    # BOTH paths deviate from the true gradient; judge each against the
    # highest-precision XLA gradient instead of against each other.
    for name, a, b_def, hi in zip("q k v".split(), gf, gx, ghi):
        a, b_def, hi = map(np.asarray, (a, b_def, hi))
        scale_ = np.abs(hi).max() + 1e-12
        rel_pallas = np.abs(a - hi).max() / scale_
        rel_xla = np.abs(b_def - hi).max() / scale_
        print(f"d{name}: pallas vs highest {rel_pallas:.2e} | "
              f"xla-default vs highest {rel_xla:.2e}", flush=True)
        assert rel_pallas < max(5e-3, 3 * rel_xla), (name, rel_pallas, rel_xla)
    print("on-chip Pallas backward within default-precision error of XLA",
          flush=True)

    # --- timing (bf16, hot shapes) ---
    for (b, t, c) in [(8, 4096, 512), (1, 36864, 512)]:
        q = jnp.asarray(rng.normal(size=(b, t, c)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, t, c)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, t, c)), jnp.bfloat16)
        # fwd 2·T²·C MACs ×2 matmuls, bwd ~2.5× fwd
        flops = 3.5 * 4.0 * b * t * t * c

        gp = jax.grad(lambda q, k, v: jnp.sum(jnp.square(
            _flash_diff(q, k, v, 1024, 512, False)).astype(jnp.float32)))
        dt = grad_bench(gp, q, k, v)
        print(f"[{b}x{t}x{c}] grad flash+pallas-bwd: {dt*1e3:8.2f} ms "
              f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)

        if t <= 8192:
            os.environ["CONTROL_GIC_FLASH_BWD"] = "xla"
            dt = grad_bench(gp, q, k, v)
            del os.environ["CONTROL_GIC_FLASH_BWD"]
            print(f"[{b}x{t}x{c}] grad flash+xla-bwd   : {dt*1e3:8.2f} ms "
                  f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)

            gx = jax.grad(lambda q, k, v: jnp.sum(jnp.square(
                attention_xla(q, k, v)).astype(jnp.float32)))
            dt = grad_bench(gx, q, k, v)
            print(f"[{b}x{t}x{c}] grad xla einsum      : {dt*1e3:8.2f} ms "
                  f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
