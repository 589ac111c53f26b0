"""Flash-attention kernel: interpret-mode parity with the XLA path and —
critically — differentiability of the dispatch wrapper (training regressed
once when the raw pallas kernel, which has no JVP rule, engaged under
grad; _flash_diff's custom VJP is what makes train graphs legal)."""
import numpy as np
import jax
import jax.numpy as jnp

from control_gic_tpu.ops.attention import (_flash_diff, attention_flash,
                                           attention_flash_with_lse,
                                           attention_xla)


def _qkv(rng, b=1, t=512, c=64):
    q = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    return q, k, v


def test_flash_matches_xla_interpret(rng):
    q, k, v = _qkv(rng)
    want = attention_xla(q, k, v)
    got = attention_flash(q, k, v, 256, 128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_dispatch_is_differentiable(rng):
    """grad through _flash_diff (Pallas FlashAttention-2 backward) must
    match grad through attention_xla."""
    q, k, v = _qkv(rng, t=256, c=32)

    loss_flash = lambda q, k, v: jnp.sum(
        jnp.square(_flash_diff(q, k, v, 128, 128, True)))
    loss_xla = lambda q, k, v: jnp.sum(jnp.square(attention_xla(q, k, v)))
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)


def test_flash_xla_bwd_fallback_matches(rng, monkeypatch):
    """CONTROL_GIC_FLASH_BWD=xla engages the einsum-recompute backward;
    both backward implementations must agree."""
    q, k, v = _qkv(rng, t=256, c=32)
    loss = lambda q, k, v: jnp.sum(
        jnp.square(_flash_diff(q, k, v, 128, 128, True)))
    g_pallas = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("CONTROL_GIC_FLASH_BWD", "xla")
    g_xla = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)


def test_flash_lse_residual(rng):
    """lse emitted by the residual-saving forward equals the logsumexp of
    the scaled logits, and o matches the plain flash forward."""
    q, k, v = _qkv(rng, t=256, c=32)
    o, lse = attention_flash_with_lse(q, k, v, 128, 128, interpret=True)
    want_o = attention_xla(q, k, v)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("btc,bsc->bts", q, k) * scale
    want_lse = jax.nn.logsumexp(logits, axis=-1)[..., None]
    np.testing.assert_allclose(np.asarray(o), np.asarray(want_o),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               atol=2e-5, rtol=2e-5)


def test_flash_dispatch_under_jit_and_vmap(rng):
    q, k, v = _qkv(rng, b=2, t=256, c=32)
    out = jax.jit(lambda q, k, v: _flash_diff(q, k, v, 128, 128, True))(
        q, k, v)
    want = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_cross_lengths_matches_xla(rng):
    """Tq != Tk (H-sharded decoder: local queries vs gathered KV) — forward
    and FlashAttention-2 backward both support rectangular shapes."""
    q = jnp.asarray(rng.normal(size=(1, 256, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1024, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 1024, 64)), jnp.float32)
    want = attention_xla(q, k, v)
    got = attention_flash(q, k, v, 256, 256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    o, lse = attention_flash_with_lse(q, k, v, 256, 256, interpret=True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    from control_gic_tpu.ops.attention import _flash_backward
    g = jnp.asarray(rng.normal(size=q.shape), jnp.float32)
    dq, dk, dv = _flash_backward(q, k, v, o, lse, g, 256, 256,
                                 interpret=True)
    wq, wk, wv = jax.vjp(attention_xla, q, k, v)[1](g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(wq),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(wk),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(wv),
                               atol=2e-4, rtol=2e-4)
