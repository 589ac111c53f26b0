# rt256 + 768-decode chain A/B. Chain engagement is read from the env at
# TRACE time, so each arm builds fresh jit wrappers.
import os

from control_gic_tpu.models.cgic import CGIC as _CGIC


def rt_fn():
    @jax.jit
    def roundtrip_scan(v, xs):
        def body(acc, x):
            rec, enc = model.apply(v, x, 0.1, 0.4)
            return acc + jnp.sum(rec.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), xs)
        return acc
    return roundtrip_scan


def dec_fn_768():
    @jax.jit
    def dec(v, ind, m_c, m_m, m_f):
        rec = model.apply(v, ind, (m_c, m_m, m_f),
                          method=_CGIC.decode_indices)
        return (jnp.clip(rec, 0.0, 1.0) * 255).astype(jnp.uint8)
    return dec


iters, batch = 8, 8
xs_w = jnp.asarray(rng.uniform(0, 1, (iters, batch, 256, 256, 3)),
                   jnp.float32)
xs_a = jnp.asarray(rng.uniform(0, 1, (iters, batch, 256, 256, 3)),
                   jnp.float32)
xs_b = jnp.asarray(rng.uniform(0, 1, (iters, batch, 256, 256, 3)),
                   jnp.float32)

# 768-tile decode inputs (6 tiles, mode-0 style masks)
hl = 192
ind6 = jnp.asarray(rng.integers(0, 1024, (6, hl, hl)), jnp.int32)
mc = np.zeros((6, hl // 4, hl // 4), np.int32)
mc[:, : hl // 8] = 1
mm = np.zeros((6, hl // 2, hl // 2), np.int32)
mm[:, hl // 4: hl // 3] = 1
mf = (1 - mm.repeat(2, 1).repeat(2, 2) - mc.repeat(4, 1).repeat(4, 2))
mc, mm, mf = (jnp.asarray(m) for m in (mc, mm, mf))

results = {}
for arm in ("plain", "chain"):
    os.environ["CONTROL_GIC_CHAIN"] = "1" if arm == "chain" else "0"
    fn = rt_fn()
    t0 = time.perf_counter()
    float(fn(variables, xs_w))
    print(arm, "rt256 warm", round(time.perf_counter() - t0, 1), "s")
    t0 = time.perf_counter()
    float(fn(variables, xs_a))
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(variables, xs_b))
    dt2 = time.perf_counter() - t0
    results[arm + "_rt256"] = (round(batch * iters / dt, 1),
                               round(batch * iters / dt2, 1))

    dfn = dec_fn_768()
    t0 = time.perf_counter()
    out = dfn(variables, ind6, mc, mm, mf)
    out.block_until_ready()
    print(arm, "dec768 warm", round(time.perf_counter() - t0, 1), "s")
    # chained reps: distinct index grids (axon dedupes identical execs)
    inds = [jnp.asarray(rng.integers(0, 1024, (6, hl, hl)), jnp.int32)
            for _ in range(3)]
    t0 = time.perf_counter()
    outs = [dfn(variables, i, mc, mm, mf) for i in inds]
    for o in outs:
        o.block_until_ready()
    results[arm + "_dec768_ms"] = round((time.perf_counter() - t0) / 3 * 1e3,
                                        1)
    results[arm + "_dec768_out"] = np.asarray(out)

os.environ["CONTROL_GIC_CHAIN"] = "0"
d = np.abs(results["plain_dec768_out"].astype(np.int32)
           - results["chain_dec768_out"].astype(np.int32))
print("rt256 img/s plain", results["plain_rt256"], "chain",
      results["chain_rt256"])
print("dec768 ms plain", results["plain_dec768_ms"], "chain",
      results["chain_dec768_ms"])
print("uint8 recon |diff|: max", int(d.max()), "mean", float(d.mean()))
