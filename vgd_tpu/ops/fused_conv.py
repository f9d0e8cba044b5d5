"""Fused Conv(4x4, stride 2) + train-mode BatchNorm + LeakyReLU.

This is the encoder / discriminator hot stack (main_vae.py:20-31 ConvBlock:
Conv 4x4 s2 VALID + BN + LeakyReLU(0.01); gan_code.py:59-66: Conv 4x4 s2
pad 1 + BN + LeakyReLU(0.2)) as ONE differentiable op, designed TPU-first
rather than as three library calls:

* **Forward (Pallas)** — the stride-2 4x4 conv is re-expressed as a 2x2
  stride-1 conv over a space-to-depth(2) input (done once in XLA, fused with
  the pad), so every tap is an UNstrided VMEM slice feeding an MXU matmul of
  shape (Ho*Ws, 4C) x (4C, K). The per-channel batch statistics (sum, sum of
  squares) that train-mode BatchNorm needs are accumulated in a VMEM scratch
  as an epilogue of the same kernel — XLA cannot fuse a cross-batch reduction
  into its conv, so it pays an extra HBM read of the conv output for stats;
  here the numbers leave the MXU already reduced.
* **Normalize + LeakyReLU** — a single elementwise pass; left to XLA, which
  fuses scale/shift/activation into one kernel optimally.
* **Backward (custom VJP)** — analytic train-mode BatchNorm backward with the
  conv transposes delegated to XLA's MXU conv emitter via ``jax.vjp`` of the
  reference conv. The residuals are (x, w, gamma, beta, mean, var, y): the
  conv output and x-hat are *recomputed from y* (LeakyReLU with slope>0 is
  invertible, and BN is affine), so the fused op stores ONE output-sized
  tensor where XLA autodiff of the unfused chain keeps the conv output AND
  the normalized activations alive. Conv-bias gradient is identically zero
  under train-mode BN (any per-channel constant cancels in c - mean(c)) and
  is returned as such.

Numerical notes: all statistics and the matmul accumulate in f32
(``preferred_element_type``); variance uses the E[(x-mu)^2] two-pass form at
the XLA fallback and the (sum, sumsq) one-pass form in the kernel epilogue —
the kernel form is exact enough here because conv outputs are zero-mean-ish
at BN scale (tests pin the tolerance vs the two-pass reference).

``conv_bn_lrelu`` auto-selects: Pallas on TPU for supported shapes, XLA
otherwise. ``benchmarks/kernel_bench.py`` measures both; the model layer
only enables the kernel where it wins (SURVEY.md section 7 step 4).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only imports on TPU-capable installs
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
# Reference XLA pieces
# ---------------------------------------------------------------------------

def conv4x4s2(x: jax.Array, w: jax.Array, padding: int) -> jax.Array:
    """Plain conv: x (B,H,W,C) NHWC, w (4,4,C,K) HWIO, stride 2."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def bn_lrelu(c: jax.Array, gamma: jax.Array, beta: jax.Array,
             mean: jax.Array, var: jax.Array, slope: float,
             eps: float) -> jax.Array:
    r = jax.lax.rsqrt(var + eps)
    y = (c.astype(jnp.float32) - mean) * (r * gamma) + beta
    return jnp.where(y > 0, y, y * slope)


def conv_bn_lrelu_xla(x: jax.Array, w: jax.Array, gamma: jax.Array,
                      beta: jax.Array, bias: Optional[jax.Array] = None,
                      padding: int = 0, slope: float = 0.01,
                      eps: float = 1e-5
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Unfused reference. Returns (y, batch_mean, batch_var[biased])."""
    c = conv4x4s2(x.astype(jnp.float32), w.astype(jnp.float32), padding)
    if bias is not None:
        c = c + bias.astype(jnp.float32)
    mean = jnp.mean(c, axis=(0, 1, 2))
    var = jnp.var(c, axis=(0, 1, 2))
    return bn_lrelu(c, gamma, beta, mean, var, slope, eps), mean, var


# ---------------------------------------------------------------------------
# Pallas forward: conv (tap matmuls over a space-to-depth input) + stats
# ---------------------------------------------------------------------------

def _s2d_weights(w: jax.Array) -> jax.Array:
    """(4,4,C,K) -> (2,2,4C,K): tap (dy,dx) becomes tap (u,v) of a 2x2 s1
    conv over the space-to-depth input, at phase channel (py,px):
    dy = 2u + py, dx = 2v + px."""
    k4, _, c, k = w.shape
    assert k4 == 4
    # s2d channel order: (py, px, c) — matches _space_to_depth below.
    wn = w.reshape(2, 2, 2, 2, c, k)            # (u, py, v, px, C, K)
    wn = wn.transpose(0, 2, 1, 3, 4, 5)          # (u, v, py, px, C, K)
    return wn.reshape(2, 2, 4 * c, k)


def _space_to_depth(x: jax.Array, padding: int) -> jax.Array:
    """Pad then fold 2x2 spatial blocks into channels (py, px, c) order.
    x (B,H,W,C) -> (B,(H+2p)/2,(W+2p)/2,4C)."""
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding),
                        (0, 0)))
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)            # (B, Hs, Ws, py, px, C)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _fused_fwd_kernel(xs_ref, w_ref, c_ref, stats_ref, sum_s, sq_s,
                      *, ho: int, ws: int):
    """One image per program (sequential TPU grid).

    The input arrives row-flattened — (Hs*Ws, 4C) — so every tap (u, v) of
    the 2x2 s1 conv is a plain sublane-offset slice ``[u*Ws + v :][:Ho*Ws]``
    feeding one MXU matmul: no in-kernel reshapes (Mosaic rejects shape
    casts whose collapsed dims are not tile-aligned, e.g. bf16 (16,17,C)).
    The v=1 tap wraps each row's last element into garbage at the padded
    output column j == Ws-1, which is masked out of the statistics here and
    sliced off by the caller. Global (sum, sumsq) accumulate across the
    sequential grid in VMEM scratch; the final program writes them."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        sum_s[:] = jnp.zeros_like(sum_s)
        sq_s[:] = jnp.zeros_like(sq_s)

    k = w_ref.shape[-1]
    m = ho * ws
    acc = jnp.zeros((m, k), jnp.float32)
    for u in range(2):
        for v in range(2):
            # native-dtype operands (bf16 rides the fast MXU path),
            # f32 accumulation via preferred_element_type
            rows = xs_ref[0, pl.ds(u * ws + v, m), :]
            acc = acc + jax.lax.dot_general(
                rows, w_ref[u, v], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (Ho*Ws, K)
    c_ref[0] = acc.astype(c_ref.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % ws
    valid = (col != ws - 1).astype(jnp.float32)           # pad column mask
    masked = acc * valid
    sum_s[0, :] = sum_s[0, :] + jnp.sum(masked, axis=0)
    sq_s[0, :] = sq_s[0, :] + jnp.sum(masked * acc, axis=0)

    @pl.when(i == nb - 1)
    def _write():
        stats_ref[0, :] = sum_s[0, :]
        stats_ref[1, :] = sq_s[0, :]


def _conv_stats_pallas(x: jax.Array, w: jax.Array, padding: int,
                       interpret: bool
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused conv + batch stats. Returns (c, mean, var) with c f32."""
    b, h, wdim, cin = x.shape
    k = w.shape[-1]
    xs = _space_to_depth(x, padding)              # (B, Hs, Ws, 4C)
    wn = _s2d_weights(w)                          # (2, 2, 4C, K)
    _, hs, ws, c4 = xs.shape
    xs = xs.reshape(b, hs * ws, c4)               # row-flattened (free)
    # the (u=1, v=1) tap slice reaches one element past the end (its value
    # only ever lands in the discarded pad column) — pad one row element
    xs = jnp.pad(xs, ((0, 0), (0, 1), (0, 0)))
    ho = (h + 2 * padding - 4) // 2 + 1
    wo = (wdim + 2 * padding - 4) // 2 + 1
    assert wo == ws - 1 and ho == hs - 1
    kernel = functools.partial(_fused_fwd_kernel, ho=ho, ws=ws)
    scratch = []
    if _HAS_PLTPU:
        scratch = [pltpu.VMEM((1, k), jnp.float32),
                   pltpu.VMEM((1, k), jnp.float32)]
    cpad, stats = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hs * ws + 1, c4), lambda i: (i, 0, 0)),
            pl.BlockSpec((2, 2, c4, k), lambda i: (0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ho * ws, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((2, k), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ho * ws, k), jnp.float32),
            jax.ShapeDtypeStruct((2, k), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(xs, wn)
    # drop the padded output column (garbage from the v=1 tap wrap)
    c = cpad.reshape(b, ho, ws, k)[:, :, :wo, :]
    n = b * ho * wo
    mean = stats[0] / n
    var = stats[1] / n - mean * mean              # one-pass; f32 accumulated
    var = jnp.maximum(var, 0.0)
    return c, mean, var


# ---------------------------------------------------------------------------
# Differentiable fused op
# ---------------------------------------------------------------------------

def _fwd_impl(x, w, gamma, beta, padding, slope, eps, use_pallas, interpret):
    if use_pallas:
        c, mean, var = _conv_stats_pallas(x, w, padding, interpret)
    else:
        c = conv4x4s2(x, w, padding)   # preferred_element_type=f32 inside
        mean = jnp.mean(c, axis=(0, 1, 2))
        var = jnp.var(c, axis=(0, 1, 2))
    y = bn_lrelu(c, gamma, beta, mean, var, slope, eps)
    return y, mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _conv_bn_lrelu(x, w, gamma, beta, padding, slope, eps, use_pallas,
                   interpret):
    return _fwd_impl(x, w, gamma, beta, padding, slope, eps, use_pallas,
                     interpret)


def _cbl_fwd(x, w, gamma, beta, padding, slope, eps, use_pallas, interpret):
    y, mean, var = _fwd_impl(x, w, gamma, beta, padding, slope, eps,
                             use_pallas, interpret)
    return (y, mean, var), (x, w, gamma, beta, mean, var, y)


def _cbl_bwd(padding, slope, eps, use_pallas, interpret, res, cts):
    x, w, gamma, beta, mean, var, y = res
    g = cts[0].astype(jnp.float32)   # mean/var cotangents: running-stats
    y = y.astype(jnp.float32)        # bookkeeping only, not differentiated
    # LeakyReLU backward; slope > 0 keeps sign(y) == sign(pre-activation)
    pos = y > 0
    g1 = jnp.where(pos, g, g * slope)
    # x-hat recomputed from y: lrelu and the BN affine are both invertible
    # clamp at 1e-3, not epsilon: xhat is recomputed as (pre-beta)/gamma, so
    # rounding error in `pre` is amplified by 1/|gamma| — with a 1e-12 floor
    # a decayed BN scale makes dgamma/dx garbage. 1e-3 caps the amplification
    # at ~1e3x (fine for f32 residuals) at the cost of biased grads only for
    # |gamma|<1e-3, where the layer output barely depends on x anyway. The
    # alternative (storing xhat as a residual) costs the memory this fused
    # kernel exists to save.
    gamma_safe = jnp.where(jnp.abs(gamma) < 1e-3,
                           jnp.where(gamma < 0, -1e-3, 1e-3), gamma)
    pre = jnp.where(pos, y, y / slope)
    xhat = (pre - beta) / gamma_safe
    dgamma = jnp.sum(g1 * xhat, axis=(0, 1, 2))
    dbeta = jnp.sum(g1, axis=(0, 1, 2))
    # train-mode BN backward (batch statistics in the graph)
    r = jax.lax.rsqrt(var + eps)
    dxhat = g1 * gamma
    m_d = jnp.mean(dxhat, axis=(0, 1, 2))
    m_dx = jnp.mean(dxhat * xhat, axis=(0, 1, 2))
    dc = (dxhat - m_d - xhat * m_dx) * r
    # conv transposes via XLA's MXU emitter, in the compute dtype (the
    # cotangent must match the primal output dtype, and lax.conv rejects
    # mixed-dtype operands — so the whole vjp runs in x.dtype, exactly what
    # XLA autodiff does for the unfused bf16 path)
    cd = x.dtype
    _, conv_vjp = jax.vjp(
        lambda xx, ww: jax.lax.conv_general_dilated(
            xx, ww, window_strides=(2, 2),
            padding=((padding, padding), (padding, padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        x, w.astype(cd))
    dx, dw = conv_vjp(dc.astype(cd))
    return (dx.astype(x.dtype), dw.astype(w.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype))


_conv_bn_lrelu.defvjp(_cbl_fwd, _cbl_bwd)


def conv_bn_lrelu(x: jax.Array, w: jax.Array, gamma: jax.Array,
                  beta: jax.Array, bias: Optional[jax.Array] = None,
                  padding: int = 0, slope: float = 0.01, eps: float = 1e-5,
                  force: Optional[str] = None, interpret: bool = False
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused Conv4x4s2 + train-BN + LeakyReLU. Returns (y, mean, var).

    mean/var are the biased batch statistics (for running-stat updates);
    they are treated as non-differentiable bookkeeping, matching flax/torch
    (running stats never carry gradients). ``bias`` is folded analytically:
    a conv bias shifts the batch mean one-for-one and cancels in the
    normalization, so y is bias-independent and d(bias) == 0; only the
    reported mean includes it (so running stats match the unfused form).
    """
    b, h, wdim, cin = x.shape
    use_pallas = (force == "pallas") or (
        force is None and _on_tpu() and _HAS_PLTPU)
    hp, wp = h + 2 * padding, wdim + 2 * padding
    # shape gate: s2d needs even padded dims; VMEM per image capped at 4 MiB
    fits = (hp % 2 == 0 and wp % 2 == 0 and
            (hp // 2) * (wp // 2) * 4 * cin * 4 <= 4 * 1024 * 1024)
    if force == "xla" or not (use_pallas and fits):
        use_pallas = False
    y, mean, var = _conv_bn_lrelu(x, w, gamma, beta, padding, slope, eps,
                                  use_pallas, interpret)
    if bias is not None:
        mean = mean + jax.lax.stop_gradient(bias.astype(jnp.float32))
    return y, mean, var
