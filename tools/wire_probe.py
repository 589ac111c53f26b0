"""Tunnel overlap probe: can H2D, D2H, and device compute overlap?

The full-codec pipeline is wire-bound on this box (~30 MB/s tunnel,
tools/codec_breakdown.py). Whether threading/async can hide transfer time
depends on runtime properties this script measures directly:

  1. serial H2D / D2H bandwidth on ~10 MB buffers (baseline)
  2. concurrent H2D + D2H from two threads (full duplex? GIL released?)
  3. compute || D2H: dispatch a long matmul chain, then fetch an unrelated
     large array — does the fetch overlap execution?
  4. copy_to_host_async: does pre-starting the transfer make the later
     np.asarray cheap?

python tools/wire_probe.py   (TPU; one small matmul compile)
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from control_gic_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    rng = np.random.default_rng(0)
    MB = 10
    bufs = [rng.integers(0, 255, (MB * 1024 * 1024,), dtype=np.uint8)
            for _ in range(6)]

    # a compute program taking ~300 ms on chip: chained matmuls
    n = 4096
    a0 = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def burn(a, k):
        def body(x, _):
            return jnp.tanh(x @ a0), None
        x, _ = jax.lax.scan(body, a, None, length=k)
        return x

    k = int(os.environ.get("WP_ITERS", "48"))
    float(burn(a0, k)[0, 0].astype(jnp.float32))  # compile+warm
    t0 = time.perf_counter()
    float(burn(a0, k)[0, 0].astype(jnp.float32))
    t_burn = time.perf_counter() - t0
    print(f"compute chain: {t_burn*1e3:.0f} ms")

    # 1. serial H2D
    devs = []
    t0 = time.perf_counter()
    for b in bufs[:3]:
        d = jax.device_put(b)
        d.block_until_ready()
        devs.append(d)
    t_h2d = time.perf_counter() - t0
    print(f"H2D serial: {3*MB/t_h2d:6.1f} MB/s ({t_h2d*1e3:.0f} ms / 3x{MB}MB)")

    # 2. serial D2H
    t0 = time.perf_counter()
    for d in devs:
        np.asarray(d)
    t_d2h = time.perf_counter() - t0
    print(f"D2H serial: {3*MB/t_d2h:6.1f} MB/s ({t_d2h*1e3:.0f} ms)")

    # 3. concurrent H2D + D2H
    up = bufs[3:6]
    down = devs
    t_up = t_down = 0.0

    def uploader():
        nonlocal t_up
        t0 = time.perf_counter()
        for b in up:
            jax.device_put(b).block_until_ready()
        t_up = time.perf_counter() - t0

    def downloader():
        nonlocal t_down
        t0 = time.perf_counter()
        for d in down:
            np.asarray(d)
        t_down = time.perf_counter() - t0

    t0 = time.perf_counter()
    th1 = threading.Thread(target=uploader)
    th2 = threading.Thread(target=downloader)
    th1.start(); th2.start(); th1.join(); th2.join()
    t_both = time.perf_counter() - t0
    print(f"concurrent H2D+D2H: {t_both*1e3:.0f} ms "
          f"(serial sum would be {(t_h2d+t_d2h)*1e3:.0f} ms; "
          f"overlap factor {(t_h2d+t_d2h)/t_both:.2f}x)")

    # 4. compute || D2H: dispatch burn, immediately fetch unrelated arrays
    d_new = jax.device_put(bufs[0]); d_new.block_until_ready()
    out = burn(a0, k)                      # async dispatch
    t0 = time.perf_counter()
    np.asarray(d_new)                      # D2H while burn runs?
    t_fetch_during = time.perf_counter() - t0
    float(out[0, 0].astype(jnp.float32))
    t_total = time.perf_counter() - t0
    print(f"D2H during compute: fetch {t_fetch_during*1e3:.0f} ms, "
          f"fetch+compute total {t_total*1e3:.0f} ms "
          f"(compute alone {t_burn*1e3:.0f}, D2H alone "
          f"{t_d2h/3*1e3:.0f})")

    # 5. copy_to_host_async
    d = jax.device_put(bufs[1]); d.block_until_ready()
    try:
        t0 = time.perf_counter()
        d.copy_to_host_async()
        t_start = time.perf_counter() - t0
        time.sleep(t_d2h / 3 + 0.1)        # let it complete
        t0 = time.perf_counter()
        np.asarray(d)
        t_after = time.perf_counter() - t0
        print(f"copy_to_host_async: start {t_start*1e3:.1f} ms, "
              f"asarray after wait {t_after*1e3:.0f} ms "
              f"(blocking D2H alone {t_d2h/3*1e3:.0f} ms)")
    except Exception as e:
        print(f"copy_to_host_async unsupported: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
