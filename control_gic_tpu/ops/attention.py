"""Single-head full self-attention over flattened spatial tokens.

This is the latent attention of the VQGAN blocks (behavioral contract:
/root/reference/CGIC/modules/vqvae/vqvae_blocks.py:168-192 — scale c^-0.5,
softmax over keys, no masking, single head).

Two code paths:
  - `attention_xla`: plain einsum + softmax. For <=1024 tokens XLA is at
    speed-of-light already.
  - `attention_flash`: Pallas flash attention with a (batch, q-block,
    kv-block) grid. Only one q-block and one kv-block live in VMEM at a
    time; the online-softmax running max/denominator/accumulator persist in
    VMEM scratch across the innermost kv grid steps. This bounds VMEM at
    O(block^2) regardless of token count, which is what lifts the
    reference's 768px tile cap (192x192 = 36864 latent tokens).

Inputs are [B, T, C] f32/bf16; outputs match the query dtype.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Measured on-chip (scan-based in-graph timing, tools/attn_tune.py, b=8
# t=4096 c=512 bf16): XLA einsum 7.3 ms vs flash 4.7 ms at blocks 1024x512
# (at t=36864: 38.4 vs 18.9 ms). At t=1024 XLA wins (4.0 vs 4.9 ms), so
# flash engages from 4096 tokens. Blocks >= 1024x1024 exceed VMEM.
_FLASH_MIN_TOKENS = 4096
_BLOCK_Q = 1024
_BLOCK_K = 512
# Backward blocks are smaller: the bwd kernels hold two f32 [block, C]
# gradient accumulators plus four [bq, bk] f32 intermediates in VMEM.
_BWD_BLOCK_Q = 512
_BWD_BLOCK_K = 512


def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    c = q.shape[-1]
    scale = jnp.asarray(c, jnp.float32) ** -0.5
    logits = jnp.einsum("btc,bsc->bts", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bts,bsc->btc", w.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale: float):
    """Grid = (B, Tq/bq, Tk/bk); kv is innermost so scratch carries state."""
    import jax.numpy as jnp  # noqa: F811

    ik = jax.lax.convert_element_type(_pl().program_id(2), jnp.int32)
    num_k = _pl().num_programs(2)

    @_pl().when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Dots run on native-dtype inputs (bf16 -> full-rate MXU) with f32
    # accumulation; only the online-softmax state is f32.
    q = q_ref[0]                                              # [bq, C]
    k = k_ref[0]                                              # [bk, C]
    v = v_ref[0]                                              # [bk, C]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * corr + p.sum(axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @_pl().when(ik == num_k - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _pl():
    from jax.experimental import pallas as pl
    return pl


def attention_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = _BLOCK_Q, block_k: int = _BLOCK_K,
                    interpret: bool = False) -> jnp.ndarray:
    """Pallas flash attention (forward only — not differentiable; the
    dispatch wraps it in a custom VJP). q: [B, Tq, C], k/v: [B, Tk, C];
    Tq/Tk divisible by their blocks. Tq != Tk supports the H-sharded
    decoder (local queries, all-gathered keys/values)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tq, c = q.shape
    tk = k.shape[1]
    assert tq % block_q == 0 and tk % block_k == 0, (tq, tk, block_q, block_k)
    scale = float(c) ** -0.5
    grid = (b, tq // block_q, tk // block_k)

    kernel = functools.partial(_flash_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_k, c), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, c), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda ib, iq, ik: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running denom
            pltpu.VMEM((block_q, c), jnp.float32),   # output accumulator
        ],
        interpret=interpret,
    )(q, k, v)


def _flash_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref,
                      acc_ref, *, scale: float):
    """Forward identical to `_flash_kernel` but additionally emits the
    per-row logsumexp of the scaled logits (the FlashAttention-2 backward
    residual): lse = m + log(l). lse block is [1, bq, 1] so the [bq, 1]
    scratch stores without a lane/sublane relayout."""
    ik = jax.lax.convert_element_type(_pl().program_id(2), jnp.int32)
    num_k = _pl().num_programs(2)

    @_pl().when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * corr + p.sum(axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @_pl().when(ik == num_k - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])


def attention_flash_with_lse(q, k, v, block_q: int = _BLOCK_Q,
                             block_k: int = _BLOCK_K,
                             interpret: bool = False):
    """Flash forward that also returns the [B, Tq, 1] f32 logsumexp residual
    needed by the Pallas backward."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tq, c = q.shape
    tk = k.shape[1]
    assert tq % block_q == 0 and tk % block_k == 0, (tq, tk, block_q, block_k)
    scale = float(c) ** -0.5
    grid = (b, tq // block_q, tk // block_k)

    kernel = functools.partial(_flash_lse_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_k, c), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, c), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, c), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda ib, iq, ik: (ib, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, tq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, c), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def _flash_bwd_dkdv_kernel(q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref,
                           dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float):
    """Grid = (B, Tk/bk, Tq/bq); q is innermost so the dk/dv accumulators
    for one k-block persist in VMEM scratch across the q sweep.

      p  = exp(q kᵀ·scale − lse)
      dv += pᵀ do
      ds = p ∘ (do vᵀ − rowsum(do ∘ o))
      dk += dsᵀ q · scale
    """
    iq = jax.lax.convert_element_type(_pl().program_id(2), jnp.int32)
    num_q = _pl().num_programs(2)

    @_pl().when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]                                              # [bq, C]
    do = do_ref[0]                                            # [bq, C]
    o = o_ref[0]                                              # [bq, C]
    lse = lse_ref[0]                                          # [bq, 1] f32
    k = k_ref[0]                                              # [bk, C]
    v = v_ref[0]                                              # [bk, C]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)                                      # [bq, bk] f32
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # pᵀ do
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    delta = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(
        axis=-1, keepdims=True)                               # [bq, 1]
    ds = p * (dp - delta)
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale           # dsᵀ q

    @_pl().when(iq == num_q - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref,
                         dq_ref, dq_acc, *, scale: float):
    """Grid = (B, Tq/bq, Tk/bk); kv innermost, dq accumulates in scratch.

      ds = p ∘ (do vᵀ − rowsum(do ∘ o));  dq += ds k · scale
    """
    ik = jax.lax.convert_element_type(_pl().program_id(2), jnp.int32)
    num_k = _pl().num_programs(2)

    @_pl().when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    lse = lse_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    delta = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(
        axis=-1, keepdims=True)
    ds = p * (dp - delta)
    dq_acc[:] += jnp.dot(ds.astype(k.dtype), k,
                         preferred_element_type=jnp.float32) * scale

    @_pl().when(ik == num_k - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_backward(q, k, v, o, lse, do, block_q: int, block_k: int,
                    interpret: bool = False):
    """FlashAttention-2 backward: two Pallas kernels, O(block²) VMEM,
    never materializing the [T, T] score matrix (the XLA einsum backward
    does, which at the 768px-tile latent is 36864² f32 = 5.4 GB)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tq, c = q.shape
    tk = k.shape[1]
    assert tq % block_q == 0 and tk % block_k == 0, (tq, tk, block_q, block_k)
    scale = float(c) ** -0.5

    q_spec = pl.BlockSpec((1, block_q, c), lambda ib, io, ii: (ib, ii, 0))
    lse_spec = pl.BlockSpec((1, block_q, 1), lambda ib, io, ii: (ib, ii, 0))
    k_spec = pl.BlockSpec((1, block_k, c), lambda ib, io, ii: (ib, io, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkdv_kernel, scale=scale),
        grid=(b, tk // block_k, tq // block_q),
        in_specs=[q_spec, q_spec, q_spec, lse_spec, k_spec, k_spec],
        out_specs=[k_spec, k_spec],
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, c), jnp.float32),
                        pltpu.VMEM((block_k, c), jnp.float32)],
        interpret=interpret,
    )(q, do, o, lse, k, v)

    q_spec2 = pl.BlockSpec((1, block_q, c), lambda ib, io, ii: (ib, io, 0))
    lse_spec2 = pl.BlockSpec((1, block_q, 1), lambda ib, io, ii: (ib, io, 0))
    k_spec2 = pl.BlockSpec((1, block_k, c), lambda ib, io, ii: (ib, ii, 0))
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        grid=(b, tq // block_q, tk // block_k),
        in_specs=[q_spec2, q_spec2, q_spec2, lse_spec2, k_spec2, k_spec2],
        out_specs=q_spec2,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, c), jnp.float32)],
        interpret=interpret,
    )(q, do, o, lse, k, v)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_diff(q, k, v, block_q, block_k, interpret):
    """Differentiable flash attention: Pallas forward AND Pallas backward
    (FlashAttention-2; lse residual saved by the forward). pallas_call has
    no JVP rule, so the kernel MUST be wrapped this way anywhere under
    grad. Set CONTROL_GIC_FLASH_BWD=xla to fall back to the einsum-
    recompute backward (materializes T² scores; bit-identical to the
    pre-flash training path)."""
    return attention_flash(q, k, v, block_q, block_k, interpret)


def _use_xla_bwd() -> bool:
    import os
    return os.environ.get("CONTROL_GIC_FLASH_BWD", "").lower() == "xla"


def _cap_blocks(q, k, block_q, block_k, cap_f32, cap_bf16):
    """The tuned forward blocks (1024x512) are VMEM-sized for bf16; f32
    doubles every buffer, so cap block sizes by dtype (measured: the f32
    lse-forward at 1024x512 C=512 needs 18.9M scoped VMEM > 16M limit).
    Query and key blocks divide their own (possibly different) lengths."""
    cap = cap_bf16 if q.dtype == jnp.bfloat16 else cap_f32
    bq = _pick_block(q.shape[1], min(block_q, cap)) or block_q
    bk = _pick_block(k.shape[1], min(block_k, cap)) or block_k
    return bq, bk


def _flash_diff_fwd(q, k, v, block_q, block_k, interpret):
    if _use_xla_bwd():
        return attention_flash(q, k, v, block_q, block_k,
                               interpret), (q, k, v, None, None)
    bq, bk = _cap_blocks(q, k, block_q, block_k, 512, 1024)
    o, lse = attention_flash_with_lse(q, k, v, bq, bk, interpret)
    return o, (q, k, v, o, lse)


def _flash_diff_bwd(block_q, block_k, interpret, res, g):
    q, k, v, o, lse = res
    if o is None:
        _, vjp = jax.vjp(attention_xla, q, k, v)
        return vjp(g)
    bq, bk = _cap_blocks(q, k, min(block_q, _BWD_BLOCK_Q),
                         min(block_k, _BWD_BLOCK_K), 256, _BWD_BLOCK_Q)
    return _flash_backward(q, k, v, o, lse, g, bq, bk, interpret)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def _pick_block(t: int, preferred: int) -> int:
    """Largest power-of-two block <= preferred that divides t (>= 256)."""
    b = preferred
    while b >= 256:
        if t % b == 0:
            return b
        b //= 2
    return 0


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              use_flash: bool | None = None) -> jnp.ndarray:
    """Dispatch: flash for long sequences on TPU, einsum otherwise.

    Tq may differ from Tk (H-sharded decoder: local queries, gathered
    keys/values); the flash-engage threshold is the KV length — that is
    the axis whose materialized [Tq, Tk] scores the kernel avoids."""
    tq, tk = q.shape[1], k.shape[1]
    bq = _pick_block(tq, _BLOCK_Q)
    bk = _pick_block(tk, _BLOCK_K)
    if use_flash is None:
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        use_flash = on_tpu and tk >= _FLASH_MIN_TOKENS and bq > 0 and bk > 0
    if use_flash:
        # dtype-cap the blocks HERE too, not only in the VJP wrappers: the
        # tuned bf16 blocks (1024x512) VMEM-OOM the f32 forward at C=512
        # (18.9M scoped > 16M limit — hit by any f32 inference at >= 4096
        # tokens, e.g. cli.infer without the bf16 config)
        bq, bk = _cap_blocks(q, k, bq or _BLOCK_Q, bk or _BLOCK_K, 512, 1024)
        return _flash_diff(q, k, v, bq, bk, False)
    return attention_xla(q, k, v)
