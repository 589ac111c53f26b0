import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_cache_axon"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from control_gic_tpu.codec import CGICCodec
from control_gic_tpu.models import CGIC, CGICConfig
from control_gic_tpu.parallel.tiling import compress_tiled_device

cfg = CGICConfig(dtype="bfloat16")
model = CGIC(cfg)
rng = np.random.default_rng(0)
x0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
t0 = time.perf_counter()
variables = model.init(jax.random.PRNGKey(0), x0, 0.1, 0.4)
print("init", time.perf_counter() - t0, "s")
counts = np.maximum(rng.poisson(100, cfg.n_embed), 1).astype(np.int64)
codec = CGICCodec(model, variables, counts)


def u8(shape, n):
    return [(rng.uniform(0, 1, shape) * 255).astype(np.uint8)
            for _ in range(n)]


def pstats(st, n):
    keys = ("a_upload_s", "b_sync_s", "b_fetch_s", "b_frame_s",
            "b_rebuild_s", "b_h2d_dispatch_s", "c_sync_s", "c_fetch_s",
            "wall_s")
    out = {k[:-2]: round(st.get(k, 0.0) * 1e3 / n, 1) for k in keys}
    out["du"] = int(st.get("device_unpack", -1))
    return out


print("setup done", jax.devices())
