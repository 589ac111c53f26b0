"""Benchmark: flagship codec round-trip throughput on the attached TPU chip.

Measures the full neural codec round-trip (entropy maps -> router -> encoder
-> VQ -> mask-aware decoder) at 256x256, bf16 activations, steady state, and
prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "img/s", "vs_baseline": ...}

Baseline note: the reference publishes no speed numbers (SURVEY.md §6). The
driver's target is >=3x an A100 running the 130M-param PyTorch reference;
we take 12.5 img/s as the A100 round-trip estimate for this model family
(fp32 torch, batch~8, 256^2 — conservative published-VQGAN-class figure),
so vs_baseline = value / (3 * 12.5). The absolute img/s value is the
authoritative record; the baseline divisor is fixed across rounds so the
trend is comparable.
"""
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(f"~/.cache/jax_cache_{jax.default_backend()}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from control_gic_tpu.models import CGIC, CGICConfig

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    on_tpu = jax.default_backend() not in ("cpu",)
    if not on_tpu:
        batch, iters = 1, 2   # CPU smoke mode

    cfg = CGICConfig(dtype="bfloat16")
    model = CGIC(cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, 0.1, 0.4)

    # Timing methodology: the experimental TPU runtime dedupes repeated
    # identical executions and its block_until_ready is unreliable for
    # batched async dispatch, both of which inflate naive host loops ~100x.
    # Run all iterations inside ONE jitted lax.scan over distinct inputs
    # (single dispatch, single scalar fetch) — pure device time, nothing
    # can be elided, reordered, or left pending.
    @jax.jit
    def roundtrip_scan(variables, xs):
        def body(acc, x):
            rec, enc = model.apply(variables, x, 0.1, 0.4)
            return acc + jnp.sum(rec.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), xs)
        return acc

    # separate warmup input: the runtime caches repeat executions of an
    # identical (fn, args) pair, so the timed call must differ
    xs_warm = jnp.asarray(rng.uniform(0, 1, (iters, batch, 256, 256, 3)),
                          jnp.float32)
    xs = jnp.asarray(rng.uniform(0, 1, (iters, batch, 256, 256, 3)),
                     jnp.float32)
    float(roundtrip_scan(variables, xs_warm))   # warmup / compile

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    t0 = time.perf_counter()
    _ = float(roundtrip_scan(variables, xs))
    dt = time.perf_counter() - t0

    if profile_dir:
        jax.profiler.stop_trace()

    imgs_per_sec = batch * iters / dt
    baseline = 3.0 * 12.5   # 3x assumed A100 reference round-trip (module doc)
    print(json.dumps({
        "metric": "codec_roundtrip_256_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
