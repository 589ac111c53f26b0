"""Fused SpatialNorm+swish+conv kernel vs the XLA composition, on-chip.

Sweeps (bh, co_blk) block sizes at the decoder's hot shapes and prints
per-shape winners. Scan-based in-graph timing (chained outputs, single
dispatch/fetch) — see CLAUDE.md on why naive dispatch loops lie on this
runtime.

Run on TPU:  python tools/norm_conv_tune.py           (default sweep)
             BENCH_SHAPES=mid python tools/norm_conv_tune.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from control_gic_tpu.ops.norm_conv import (_norm_conv_forward, _pick_bh,
                                           _pick_co, norm_conv_reference)

ITERS = int(os.environ.get("BENCH_ITERS", "16"))


def scan_bench(fn, x0, args, iters=ITERS):
    """Chain iterations through the conv output (Cin==Cout only)."""
    @jax.jit
    def run(x0, *args):
        def body(x, _):
            o = fn(x, *args)
            return o.astype(x.dtype), None
        o, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(o.astype(jnp.float32))

    float(run(x0 + 1.0, *args))                  # compile
    t0 = time.perf_counter()
    float(run(x0, *args))
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), flush=True)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(f"~/.cache/jax_cache_{jax.default_backend()}"))
    rng = np.random.default_rng(0)

    # decoder hot shapes (B,H,W,C): mid stacks at 64^2x512 (12 convs/iter),
    # the 128^2x256 trunk (6), the 256^2x128 trunk (~5). Cin==Cout so the
    # scan can chain. zq is the 4-ch latent nearest-resized to feature size.
    shapes = {
        "mid":   (8, 64, 64, 512),
        "up128": (8, 128, 128, 256),
        "up256": (8, 256, 256, 128),
        "lo32":  (8, 32, 32, 512),
    }
    sel = os.environ.get("BENCH_SHAPES")
    if sel:
        shapes = {k: v for k, v in shapes.items() if k in sel.split(",")}

    for name, (b, h, w, c) in shapes.items():
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
        zq = jnp.asarray(rng.normal(size=(b, h, w, 4)), jnp.bfloat16)
        gs = jnp.asarray(rng.normal(1, 0.1, c), jnp.float32)
        gb = jnp.asarray(rng.normal(0, 0.1, c), jnp.float32)
        wy = jnp.asarray(rng.normal(size=(4, c)) * 0.3, jnp.float32)
        by = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)
        wb = jnp.asarray(rng.normal(size=(4, c)) * 0.3, jnp.float32)
        bb = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)
        cw = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.02, jnp.float32)
        cb = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)
        args = (zq, gs, gb, wy, by, wb, bb, cw, cb)

        ref = lambda xx, *a: norm_conv_reference(xx, *a, act_swish=True)

        # correctness on-chip first
        want = np.asarray(ref(x, *args), np.float32)
        got = np.asarray(
            _norm_conv_forward(x, *args, act_swish=True), np.float32)
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
        assert rel < 3e-2, (name, rel)

        gflop = 2 * b * h * w * c * c * 9 / 1e9
        dt = scan_bench(ref, x, args)
        print(f"[{name} {b}x{h}x{w}x{c}] xla    : {dt*1e3:7.3f} ms "
              f"({gflop/dt/1e3:6.1f} TF/s)", flush=True)

        bh0 = _pick_bh(h, w, c, 2)
        co0 = _pick_co(c, c, 2)
        cands = {(bh0, co0)}
        for bh in {bh0, max(1, bh0 // 2), min(h, bh0 * 2)}:
            for co in {co0, 128, min(c, 256)}:
                if h % bh == 0 and c % co == 0:
                    cands.add((bh, co))
        best = None
        for bh, co in sorted(cands):
            fn = lambda xx, *a: _norm_conv_forward(
                xx, *a, act_swish=True, bh=bh, co_blk=co)
            try:
                dt = scan_bench(fn, x, args)
            except Exception as e:  # VMEM OOM etc.
                print(f"    bh={bh:3d} co={co:3d}: FAIL "
                      f"{type(e).__name__}", flush=True)
                continue
            print(f"    bh={bh:3d} co={co:3d}: {dt*1e3:7.3f} ms "
                  f"({gflop/dt/1e3:6.1f} TF/s)", flush=True)
            if best is None or dt < best[0]:
                best = (dt, bh, co)
        if best:
            print(f"  -> best fused {best[0]*1e3:.3f} ms "
                  f"(bh={best[1]}, co={best[2]})", flush=True)


if __name__ == "__main__":
    main()
