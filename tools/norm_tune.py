"""Fused SpatialNorm kernel vs XLA composition at the decoder's hot shapes.

Scan-based in-graph timing (chained outputs, single dispatch/fetch).
Run on TPU: python tools/norm_tune.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from control_gic_tpu.ops.fused_norm import (_make_fused,
                                            spatial_norm_reference)

ITERS = int(os.environ.get("BENCH_ITERS", "16"))


def scan_bench(fn, f0, args, iters=ITERS):
    @jax.jit
    def run(f0, *args):
        def body(f, _):
            o = fn(f, *args)
            return o.astype(f.dtype), None
        o, _ = jax.lax.scan(body, f0, None, length=iters)
        return jnp.sum(o.astype(jnp.float32))

    float(run(f0 + 1.0, *args))
    t0 = time.perf_counter()
    float(run(f0, *args))
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(f"~/.cache/jax_cache_{jax.default_backend()}"))
    rng = np.random.default_rng(0)
    fused = _make_fused(True)
    ref = lambda *a: spatial_norm_reference(*a, act_swish=True)

    # decoder hot shapes: (B, H, W, C) feature map, zq at latent 64x64
    shapes = [(8, 64, 64, 512), (8, 128, 128, 256), (8, 256, 256, 128)]
    for (b, h, w, c) in shapes:
        f = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
        zq = jnp.asarray(rng.normal(size=(b, h, w, 4)), jnp.bfloat16)
        gs = jnp.asarray(rng.normal(1, 0.1, c), jnp.float32)
        gb = jnp.asarray(rng.normal(0, 0.1, c), jnp.float32)
        wy = jnp.asarray(rng.normal(size=(4, c)) * 0.3, jnp.float32)
        by = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)
        wb = jnp.asarray(rng.normal(size=(4, c)) * 0.3, jnp.float32)
        bb = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)
        args = (zq, gs, gb, wy, by, wb, bb)

        of = np.asarray(fused(f, *args), np.float32)
        orf = np.asarray(ref(f, *args), np.float32)
        rel = np.abs(of - orf).max() / max(np.abs(orf).max(), 1e-9)
        assert rel < 2e-2, rel

        mb = b * h * w * c * 2 / 1e6
        for name, fn in [("xla", ref), ("fused", fused)]:
            dt = scan_bench(fn, f, args)
            print(f"[{b}x{h}x{w}x{c}] {name:6s}: {dt*1e3:7.3f} ms  "
                  f"({3 * mb / dt / 1e3:6.0f} GB/s eff @3-pass)", flush=True)


if __name__ == "__main__":
    main()
