"""Sharded single-pass codec vs batched tiles: perf + overhead comparison.

Measures, on the SAME mesh and image:
  (a) tile path    — parallel/tiling.compress_tiled (independent 768px
                     tiles batched through one program, batch sharded)
  (b) spatial path — parallel/spatial_codec.compress_spatial (H-sharded
                     single pass: halo convs, psum GroupNorm, all-gather
                     attention, ONE global routing decision)

On this box the mesh is 8 virtual CPU devices over 2 cores, so absolute
numbers are not TPU statements; what transfers is the RELATIVE cost of the
spatial path's collectives vs the tile path's embarrassing parallelism at
identical model/math, plus each path's bpp (the spatial path's single
global routing budget vs per-tile budgets). Results go into the
DESIGN.md "when to use which" table (VERDICT round-1 item 7).

python tools/spatial_perf.py
  env: SP_CH=32 SP_HW=512x768 SP_TILE=256 SP_REPS=1 SP_BACKEND=cpu
Defaults are sized for this 2-CPU box (a 768-px-tile 2K sweep at ch=32
measured >1000 s/rep here — virtual devices share 2 cores); on real
hardware raise SP_HW/SP_TILE to the production geometry (tile 768).

SP_BACKEND=tpu runs on the attached real chip instead (mesh of however
many TPU devices exist — 1 here, so the collectives are trivial but the
spatial program itself, flash attention included, is the real one): the
honest TPU-side tiled-vs-spatial number VERDICT r2 item 8 asks for, at
e.g. SP_CH=128 SP_HW=1024x1536 SP_TILE=768.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    backend = os.environ.get("SP_BACKEND", "cpu")
    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    from control_gic_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    import jax.numpy as jnp
    from control_gic_tpu.codec import CGICCodec
    from control_gic_tpu.models import CGIC, CGICConfig
    from control_gic_tpu.parallel.mesh import make_mesh
    from control_gic_tpu.parallel.spatial_codec import compress_spatial
    from control_gic_tpu.parallel.tiling import compress_tiled

    ch = int(os.environ.get("SP_CH", "32"))
    h, w = (int(v) for v in os.environ.get("SP_HW", "512x768").split("x"))
    tile = int(os.environ.get("SP_TILE", "256"))
    reps = int(os.environ.get("SP_REPS", "1"))

    cfg = CGICConfig(ch=ch, ch_mult=(1, 2, 2, 4, 4), num_res_blocks=2,
                     attn_resolutions=(32,), resolution=256,
                     dtype=os.environ.get(
                         "SP_DTYPE",
                         "float32" if backend == "cpu" else "bfloat16"))
    model = CGIC(cfg)
    rng = np.random.default_rng(0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), 0.1, 0.4)
    counts = np.maximum(rng.poisson(100, cfg.n_embed), 1).astype(np.int64)
    codec = CGICCodec(model, variables, counts)
    n_dev = 8 if backend == "cpu" else jax.device_count()
    mesh = make_mesh(n_dev)

    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)

    def timed(fn, label):
        rec, bpp, _ = fn()                      # compile + warmup
        t0 = time.perf_counter()
        for _ in range(reps):
            rec, bpp, _ = fn()
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:>28}: {dt*1e3:9.1f} ms   bpp={bpp:.4f}")
        return rec, bpp, dt

    print(f"model ch={ch}, image {h}x{w}, tile {tile}, "
          f"mesh {n_dev} {backend} device(s)")
    rec_t, bpp_t, dt_t = timed(
        lambda: compress_tiled(codec, img, 0.1, 0.4, tile=tile, mesh=mesh,
                               device_pack=False), "tiled (batched, sharded)")
    rec_s, bpp_s, dt_s = timed(
        lambda: compress_spatial(codec, img, 0.1, 0.4, mesh),
        "spatial (H-sharded 1-pass)")
    print(f"spatial/tiled wall ratio: {dt_s/dt_t:.2f}x; "
          f"bpp delta (global vs per-tile routing): {bpp_s - bpp_t:+.4f}")
    print(f"recon mean abs diff (different routing => different streams): "
          f"{np.mean(np.abs(rec_t - rec_s)):.4f}")


if __name__ == "__main__":
    main()
