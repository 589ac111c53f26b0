# Why is rt256 slow under the gated default? Check gate decisions, then
# re-measure a plain (env=0) rt256 in this same session.
import os
from control_gic_tpu.ops import norm_conv as nc

print("chain_enabled:", nc.chain_enabled())
for shp, co in [((8, 256, 256, 128), 128), ((8, 128, 128, 256), 256),
                ((8, 64, 64, 512), 256), ((8, 16, 16, 512), 512),
                ((6, 768, 768, 128), 128), ((6, 192, 192, 512), 512)]:
    print(shp, co, "->", nc.chain_admissible(shp, co))

os.environ["CONTROL_GIC_CHAIN"] = "0"


@jax.jit
def rt_scan0(v, xs):
    def body(acc, x):
        rec, enc = model.apply(v, x, 0.1, 0.4)
        return acc + jnp.sum(rec.astype(jnp.float32)), None
    acc, _ = jax.lax.scan(body, jnp.zeros(()), xs)
    return acc


iters, batch = 10, 8
xs_w = jnp.asarray(rng.uniform(0, 1, (iters, batch, 256, 256, 3)),
                   jnp.float32)
t0 = time.perf_counter()
float(rt_scan0(variables, xs_w))
print("plain rt256 warm", round(time.perf_counter() - t0, 1), "s")
for _ in range(2):
    xs = jnp.asarray(rng.uniform(0, 1, (iters, batch, 256, 256, 3)),
                     jnp.float32)
    t0 = time.perf_counter()
    float(rt_scan0(variables, xs))
    print("plain rt256 img/s",
          round(batch * iters / (time.perf_counter() - t0), 1))
os.environ.pop("CONTROL_GIC_CHAIN")
