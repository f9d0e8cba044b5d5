"""Pallas TPU kernels for the hot ops, with XLA fallbacks.

Per the Pallas TPU guide: VMEM-resident blocks, MXU matmuls with
``preferred_element_type``, online-softmax tiling for attention. Every kernel
has a reference XLA implementation; ``benchmarks/kernel_bench.py`` measures
both and the model layer picks the winner (kernels are only worth shipping
where they beat XLA — SURVEY.md §7 step 4).

Kernels:
* ``flash_attention`` — single-head fused attention over N tokens
  (softmax(QK^T/sqrt(d))V without materialising the NxN matrix in HBM).
  Serves the DDPM UNet self-attention (diffusion_model.py:44-61, whose
  reference materialises the full (HW)^2 matrix) and cross-attention to
  global tokens (diffusion_model.py:63-85).
* ``groupnorm_silu`` — fused GroupNorm(G) + SiLU epilogue
  (diffusion_model.py:20-24 pattern), one HBM round-trip instead of
  normalise-then-activate.

Pallas only lowers on TPU; on CPU backends the functions transparently use
the XLA path (tests exercise both via ``force`` flags + interpret mode).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only imports on TPU-capable installs; guard for safety
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Flash attention (single-head, batched)
# ---------------------------------------------------------------------------

def attention_xla(q: jax.Array, k: jax.Array, v: jax.Array,
                  scale: Optional[float] = None) -> jax.Array:
    """Reference XLA attention. q (B,N,D), k/v (B,M,D) -> (B,N,D)."""
    d = q.shape[-1]
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    logits = jnp.einsum("bnd,bmd->bnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_kv, n_kv):
    """One (batch, q-block) program: online-softmax over KV blocks."""
    q = q_ref[0].astype(jnp.float32) * scale          # (BQ, D)
    bq = q.shape[0]
    d = q.shape[1]

    def body(i, carry):
        acc, m_prev, l_prev = carry
        kv_slice = pl.ds(i * block_kv, block_kv)
        k_blk = k_ref[0, kv_slice, :].astype(jnp.float32)   # (BK, D)
        v_blk = v_ref[0, kv_slice, :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (BQ,BK)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: Optional[float] = None,
                    block_q: int = 256, block_kv: int = 256,
                    force: Optional[str] = None,
                    interpret: bool = False) -> jax.Array:
    """Fused attention. Falls back to XLA off-TPU or on ragged shapes.

    q: (B, N, D); k, v: (B, M, D). Single head (the reference's attention is
    single-head, diffusion_model.py:44-85).
    """
    d = q.shape[-1]
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    b, n, _ = q.shape
    m = k.shape[1]
    use_pallas = (force == "pallas") or (
        force is None and _on_tpu() and _HAS_PLTPU)
    block_q = min(block_q, n)
    block_kv = min(block_kv, m)
    shapes_ok = (n % block_q == 0) and (m % block_kv == 0) and (d % 8 == 0)
    if not (use_pallas and shapes_ok):
        # ragged/tiny shapes (or non-TPU backends): XLA handles them well
        return attention_xla(q, k, v, scale)

    grid = (b, n // block_q)
    kernel = functools.partial(_flash_kernel, scale=scale,
                               block_kv=block_kv, n_kv=m // block_kv)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


# ---------------------------------------------------------------------------
# Fused GroupNorm + SiLU
# ---------------------------------------------------------------------------

def groupnorm_silu_xla(x: jax.Array, scale: jax.Array, bias: jax.Array,
                       groups: int = 8, eps: float = 1e-5) -> jax.Array:
    """Reference XLA path: GroupNorm over (H, W, C/G) then SiLU."""
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, groups, c // groups).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = xn * scale + bias
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups, eps):
    """Group statistics via a one-hot (C, G) matmul — keeps the channel
    (lane) dimension intact; Mosaic rejects reshapes that split lanes."""
    x = x_ref[0].astype(jnp.float32)                  # (H, W, C)
    h, w, c = x.shape
    cg = c // groups
    x2 = x.reshape(h * w, c)                          # collapse sublanes only
    cidx = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    member = (cidx // cg == gidx).astype(jnp.float32)  # (C, G) one-hot
    denom = float(h * w * cg)
    sum_c = jnp.sum(x2, axis=0, keepdims=True)        # (1, C)
    hp = jax.lax.Precision.HIGHEST   # MXU default truncates f32 inputs to bf16
    g_mean = jnp.dot(sum_c, member, precision=hp,
                     preferred_element_type=jnp.float32) / denom   # (1, G)
    mean_c = jnp.dot(g_mean, member.T, precision=hp,
                     preferred_element_type=jnp.float32)           # (1, C)
    # two-pass variance (E[(x-mu)^2]) — the one-pass E[x^2]-E[x]^2 form
    # loses ~3 digits to cancellation at these reduction sizes
    centered = x2 - mean_c
    sumsq_c = jnp.sum(centered * centered, axis=0, keepdims=True)
    g_var = jnp.dot(sumsq_c, member, precision=hp,
                    preferred_element_type=jnp.float32) / denom
    var_c = jnp.dot(g_var, member.T, precision=hp,
                    preferred_element_type=jnp.float32)
    xn = centered * jax.lax.rsqrt(var_c + eps)
    y = xn * scale_ref[:][None, :] + bias_ref[:][None, :]
    y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.reshape(h, w, c).astype(o_ref.dtype)


def groupnorm_silu(x: jax.Array, scale: jax.Array, bias: jax.Array,
                   groups: int = 8, eps: float = 1e-5,
                   force: Optional[str] = None,
                   interpret: bool = False) -> jax.Array:
    """Fused GroupNorm(groups) + SiLU. x: (B, H, W, C)."""
    b, h, w, c = x.shape
    use_pallas = (force == "pallas") or (
        force is None and _on_tpu() and _HAS_PLTPU)
    # input + output + centered copy must fit VMEM: cap one image at 2 MiB f32
    fits = h * w * c * 4 <= 2 * 1024 * 1024 and c % groups == 0
    if not (use_pallas and fits):
        return groupnorm_silu_xla(x, scale, bias, groups, eps)
    kernel = functools.partial(_gn_silu_kernel, groups=groups, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale, bias)


# ---------------------------------------------------------------------------
# Flash attention with custom VJP (training path)
#
# FlashAttention-2-style backward: the forward also emits the per-row
# logsumexp; the backward recomputes probability blocks from (q, k, lse) and
# never materialises the (N, M) matrix in HBM. Serves the DDPM train step's
# bottleneck self-attention, where the reference materialises the full
# (HW)^2 matrix (diffusion_model.py:52-60) — at 256x256 input that is a
# 1024^2 matrix per image per direction of the autodiff graph.
# ---------------------------------------------------------------------------

def _flash_fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                          acc_s, m_s, l_s, *, scale, n_kv):
    """Grid (B, N/BQ, M/BKV), kv innermost: VMEM holds only one q/k/v block
    plus the (BQ, D) accumulator scratch — any M fits."""
    kv = pl.program_id(2)

    @pl.when(kv == 0)
    def _init():
        acc_s[:] = jnp.zeros_like(acc_s)
        m_s[:] = jnp.full_like(m_s, -jnp.inf)
        l_s[:] = jnp.zeros_like(l_s)

    q = q_ref[0].astype(jnp.float32) * scale          # (BQ, D)
    k_blk = k_ref[0].astype(jnp.float32)              # (BKV, D)
    v_blk = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (BQ, BKV)
    m_prev, l_prev = m_s[:], l_s[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_s[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_s[:] = acc_s[:] * alpha + jax.lax.dot_general(
        p, v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_s[:] = m_new

    @pl.when(kv == n_kv - 1)
    def _write():
        o_ref[0] = (acc_s[:] / l_s[:]).astype(o_ref.dtype)
        lse_ref[0] = m_s[:] + jnp.log(l_s[:])


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, acc_s, *, scale, n_kv):
    kv = pl.program_id(2)

    @pl.when(kv == 0)
    def _init():
        acc_s[:] = jnp.zeros_like(acc_s)

    q = q_ref[0].astype(jnp.float32)                  # (BQ, D)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                                  # (BQ, 1)
    delta = delta_ref[0]
    k_blk = k_ref[0].astype(jnp.float32)              # (BKV, D)
    v_blk = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)                              # (BQ, BKV)
    dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    acc_s[:] = acc_s[:] + jax.lax.dot_general(
        ds, k_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kv == n_kv - 1)
    def _write():
        dq_ref[0] = acc_s[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dk_s, dv_s, *, scale, n_q):
    jq = pl.program_id(2)

    @pl.when(jq == 0)
    def _init():
        dk_s[:] = jnp.zeros_like(dk_s)
        dv_s[:] = jnp.zeros_like(dv_s)

    k = k_ref[0].astype(jnp.float32)                  # (BKV, D)
    v = v_ref[0].astype(jnp.float32)
    q_blk = q_ref[0].astype(jnp.float32)              # (BQ, D)
    do_blk = do_ref[0].astype(jnp.float32)
    lse_blk = lse_ref[0]                              # (BQ, 1)
    delta_blk = delta_ref[0]
    s = jax.lax.dot_general(q_blk, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse_blk)                          # (BQ, BKV)
    # dv += p^T do  (contract over the q rows)
    dv_s[:] = dv_s[:] + jax.lax.dot_general(
        p, do_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do_blk, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_blk) * scale                 # (BQ, BKV)
    dk_s[:] = dk_s[:] + jax.lax.dot_general(
        ds, q_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(jq == n_q - 1)
    def _write():
        dk_ref[0] = dk_s[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_s[:].astype(dv_ref.dtype)


def _flash_fwd_lse(q, k, v, scale, block_q, block_kv, interpret):
    b, n, d = q.shape
    m = k.shape[1]
    kernel = functools.partial(_flash_fwd_lse_kernel, scale=scale,
                               n_kv=m // block_kv)
    scratch = []
    if _HAS_PLTPU:
        scratch = [pltpu.VMEM((block_q, d), jnp.float32),
                   pltpu.VMEM((block_q, 1), jnp.float32),
                   pltpu.VMEM((block_q, 1), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=(b, n // block_q, m // block_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kv: (i, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda i, j, kv: (i, kv, 0)),
            pl.BlockSpec((1, block_kv, d), lambda i, j, kv: (i, kv, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kv: (i, j, 0)),
            pl.BlockSpec((1, block_q, 1), lambda i, j, kv: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_diff(q, k, v, scale, block_q, block_kv, interpret):
    o, _ = _flash_fwd_lse(q, k, v, scale, block_q, block_kv, interpret)
    return o


def _flash_diff_fwd(q, k, v, scale, block_q, block_kv, interpret):
    o, lse = _flash_fwd_lse(q, k, v, scale, block_q, block_kv, interpret)
    return o, (q, k, v, o, lse)


def _flash_diff_bwd(scale, block_q, block_kv, interpret, res, g):
    q, k, v, o, lse = res
    b, n, d = q.shape
    m = k.shape[1]
    # D_i = sum_d dO_i O_i — cheap elementwise, XLA fuses it
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)                # (B, N, 1)

    dq_kernel = functools.partial(_flash_bwd_dq_kernel, scale=scale,
                                  n_kv=m // block_kv)
    scratch_q = [pltpu.VMEM((block_q, d), jnp.float32)] if _HAS_PLTPU else []
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, n // block_q, m // block_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kv: (i, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda i, j, kv: (i, kv, 0)),
            pl.BlockSpec((1, block_kv, d), lambda i, j, kv: (i, kv, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, j, kv: (i, j, 0)),
            pl.BlockSpec((1, block_q, 1), lambda i, j, kv: (i, j, 0)),
            pl.BlockSpec((1, block_q, 1), lambda i, j, kv: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kv: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=scratch_q,
        interpret=interpret,
    )(q, k, v, g, lse, delta)

    dkv_kernel = functools.partial(_flash_bwd_dkv_kernel, scale=scale,
                                   n_q=n // block_q)
    scratch_kv = ([pltpu.VMEM((block_kv, d), jnp.float32),
                   pltpu.VMEM((block_kv, d), jnp.float32)]
                  if _HAS_PLTPU else [])
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, m // block_kv, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, jq: (i, jq, 0)),
            pl.BlockSpec((1, block_kv, d), lambda i, j, jq: (i, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda i, j, jq: (i, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, j, jq: (i, jq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda i, j, jq: (i, jq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda i, j, jq: (i, jq, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_kv, d), lambda i, j, jq: (i, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda i, j, jq: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=scratch_kv,
        interpret=interpret,
    )(q, k, v, g, lse, delta)
    return dq, dk, dv


_flash_attention_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)

# below this token count the full-matrix XLA form is cheap enough that the
# kernel-call overhead is not worth paying (bottleneck self-attn at 256px
# input is 1024x1024 and qualifies; cross-attn to 64 tokens never does)
MIN_FLASH_ELEMS = 1 << 20


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              scale: Optional[float] = None,
              block_q: Optional[int] = None,
              block_kv: Optional[int] = None,
              force: Optional[str] = None,
              interpret: bool = False) -> jax.Array:
    """Differentiable fused attention: Pallas flash kernels (forward + custom
    VJP) on TPU for large token counts, the XLA full-matrix form otherwise.
    Drop-in for attention_xla on TRAINING paths. Default block sizes follow
    the measured optimum (kernel_bench docstring): 256 up to 2k tokens,
    512 beyond."""
    d = q.shape[-1]
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    b, n, _ = q.shape
    m = k.shape[1]
    auto_block = 256 if max(n, m) <= 2048 else 512
    block_q = min(block_q or auto_block, n)
    block_kv = min(block_kv or auto_block, m)
    shapes_ok = (n % block_q == 0) and (m % block_kv == 0) and (d % 8 == 0)
    big_enough = n * m >= MIN_FLASH_ELEMS or force == "pallas"
    use_pallas = (force == "pallas") or (
        force is None and _on_tpu() and _HAS_PLTPU)
    if not (use_pallas and shapes_ok and big_enough):
        return attention_xla(q, k, v, scale)
    return _flash_attention_diff(q, k, v, scale, block_q, block_kv,
                                 interpret)
