"""The Glow flow stack of one block as a handful of chunked Pallas kernels.

Why: the per-flow decomposition — whether the stock XLA scan
(models/glow.py:_block_fwd) or the per-coupling Pallas op
(ops/glow_coupling.py) — pays K=32 rounds of kernel boundaries per block:
the activation round-trips HBM between flows, every custom call re-reads
its weights, and XLA cannot fuse across the boundaries (measured: the
per-coupling op is ~par per-op but 0.54-0.67x on the full step,
benchmarks/glow_coupling_micro.py vs glow_fused_bench.py). This module
instead runs a handful of pallas_calls per block per direction — flows in
chunks of G (auto-sized so the per-call weight+grad VMEM residency fits;
the whole-K=32 f=512 call measured over the 110 MB scope):

* grid = batch tiles only; the chunk's G flows execute inside the kernel
  as a ``lax.fori_loop``, the activation staying a VMEM loop value across
  them (HBM activation traffic per chunk boundary: one small c-wide
  read + write — vs one per FLOW for the scan),
* the packed per-flow weights (leading dim K) sit in VMEM for the whole
  sweep — fetched once per call, not once per flow per tile (~24 MB bf16
  at the reference f=512 K=32 — v5e has 128 MB of VMEM; the pallas_call
  raises the default 16 MB scoped-vmem limit),
* the forward additionally streams each flow's INPUT x_k (small: the flow
  channel count is 6..96, not the 512-wide hiddens) to HBM; the backward
  reloads x_k and recomputes the 512-wide internals flash-attention-style,
* per-flow weight grads accumulate in f32 VMEM scratch across the batch
  tiles and flush once.

The flow math matches models/glow.py:_flow_fwd (nf_code.py:331-360):
ActNorm -> invertible 1x1 (PLU weight assembled OUTSIDE, differentiably) ->
additive coupling conv3x3(512)-relu-conv1x1-relu-zeroconv. The coupling
matmuls use the MXU packings of ops/glow_coupling.py (im2col K-merge,
shared-LHS N-pack — see that module's docstring).

Logdet is handled outside (it depends only on params: models/glow.py
ld_all). The data-dependent ActNorm-init pass keeps the stock scan.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vgd_tpu.ops.glow_coupling import _im2col, _pad_hw, _shift_sum

F32 = jnp.float32

_VMEM_LIMIT = 120 * 1024 * 1024
# fraction of the limit the batch-tile sizer may fill (leaves headroom for
# Mosaic's relayout temporaries, which its stack accounting bills ~3x on
# top of the raw buffer estimate — measured: the whole-K=32 f=512 call
# exceeds the 110 MB scope while the raw estimate said ~50 MB)
_FILL = 0.3

# Per-chunk VMEM budget for the flow weights + their f32 grad accumulators
# (the quantity that scales with the number of flows resident in one
# pallas_call). Keeping this small is what makes the kernel fit: flows are
# processed in chunks of G <= K per call, chained in XLA — each extra chunk
# costs one HBM round-trip of the SMALL (c-wide) activation, nothing else.
_CHUNK_BUDGET = 24 * 1024 * 1024


def _pick_chunk(K: int, c: int, f: int, taps: int, bt_hwc4: int,
                cdb: int) -> int:
    """Largest divisor of K whose per-call weight+grad residency fits."""
    per_flow = (
        f * f * (cdb + 4)                  # w2f + dw2
        + 2 * taps * (c // 2) * f * (2 * cdb + 4)   # w1f/w1r/wzr/wzf + grads
        + c * c * (4 + 4)                  # wt + dwt
        + 8 * (2 * c + 2 * f + 2 * (c // 2))        # vectors
        + bt_hwc4)                         # xsave tile per flow
    g = min(K, max(1, _CHUNK_BUDGET // max(per_flow, 1)))
    while K % g:
        g -= 1
    return g


def _pick_bt(b: int, fixed: int, per_image: int) -> int:
    budget = int(_VMEM_LIMIT * _FILL) - fixed
    bt = max(1, budget // max(per_image, 1))
    while b % bt:
        bt -= 1
    return bt


def _tree_bytes(*arrs) -> int:
    return sum(a.size * a.dtype.itemsize for a in arrs)


# ---------------------------------------------------------------------------
# in-kernel flow pieces (shapes: x (bt, h, w, c); ch = c // 2)
# ---------------------------------------------------------------------------

def _coupling_fwd(ya, w1f, b1, w2, b2, wzr, bz, sc, hw, khw, pad, cd):
    """ya (n, ch) -> (nn (n, ch) f32, h1, h2, h2p, convz) with the packed
    weights of ONE flow already materialised as values."""
    h, w = hw
    kh, kw = khw
    ph, pw = pad
    n, ch = ya.shape
    bt = n // (h * w)
    f = w2.shape[0]
    ya_sp = _pad_hw(ya.reshape(bt, h, w, ch).astype(cd), ph, pw, 0.0)
    cols = _im2col(ya_sp, h, w, kh, kw)
    acc = jnp.dot(cols, w1f, preferred_element_type=F32)
    h1 = jnp.maximum(acc + b1.astype(F32), 0.0).astype(cd)
    h2 = jnp.maximum(jnp.dot(h1, w2, preferred_element_type=F32)
                     + b2.astype(F32), 0.0).astype(cd)
    h2p = _pad_hw(h2.reshape(bt, h, w, f), ph, pw, 1.0)
    hp, wp = h + 2 * ph, w + 2 * pw
    r = jnp.dot(h2p.reshape(bt * hp * wp, f), wzr,
                preferred_element_type=F32).reshape(bt, hp, wp, -1)
    convz = (_shift_sum(r, h, w, kh, kw, ch).reshape(n, ch)
             + bz.astype(F32))
    nn = convz * jnp.exp(sc * 3.0)
    return nn, ya_sp, h1, h2, h2p, convz


def _flow_fwd_val(x, an_b, an_s, wt, w1f, b1, w2, b2, wzr, bz, sc,
                  hw, khw, pad, cd):
    """One full flow on a VMEM value x (bt,h,w,c) -> new x."""
    h, w = hw
    bt, _, _, c = x.shape
    ch = c // 2
    n = bt * h * w
    y1 = an_s * (x + an_b)
    y2 = jnp.dot(y1.reshape(n, c).astype(cd), wt.astype(cd),
                 preferred_element_type=F32)
    ya, yb = y2[:, :ch], y2[:, ch:]
    nn, *_ = _coupling_fwd(ya, w1f, b1, w2, b2, wzr, bz, sc,
                           hw, khw, pad, cd)
    out = jnp.concatenate([ya, yb + nn], axis=-1)
    return out.reshape(bt, h, w, c)


# ---------------------------------------------------------------------------
# forward kernel: grid (n_tiles,), fori_loop over K inside
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, anb_ref, ans_ref, wt_ref, w1f_ref, b1_ref, w2_ref,
                b2_ref, wzr_ref, bz_ref, sc_ref, y_ref, xsave_ref, *,
                hw, khw, pad, cd, n_flows):
    def body(k, x):
        xsave_ref[k] = x
        return _flow_fwd_val(
            x, anb_ref[k], ans_ref[k], wt_ref[k], w1f_ref[k], b1_ref[k],
            w2_ref[k], b2_ref[k], wzr_ref[k], bz_ref[k], sc_ref[k],
            hw, khw, pad, cd)

    y_ref[:] = jax.lax.fori_loop(0, n_flows, body, x_ref[:])


def _fwd_sample_kernel(x_ref, anb_ref, ans_ref, wt_ref, w1f_ref, b1_ref,
                       w2_ref, b2_ref, wzr_ref, bz_ref, sc_ref, y_ref, *,
                       hw, khw, pad, cd, n_flows):
    """Forward without the x_k stream — for no-grad eval paths."""
    def body(k, x):
        return _flow_fwd_val(
            x, anb_ref[k], ans_ref[k], wt_ref[k], w1f_ref[k], b1_ref[k],
            w2_ref[k], b2_ref[k], wzr_ref[k], bz_ref[k], sc_ref[k],
            hw, khw, pad, cd)

    y_ref[:] = jax.lax.fori_loop(0, n_flows, body, x_ref[:])


# ---------------------------------------------------------------------------
# backward kernel: grid (n_tiles,), fori_loop over K (descending) inside
# ---------------------------------------------------------------------------

def _bwd_kernel(xsave_ref, anb_ref, ans_ref, wt_ref, w1f_ref, w1r_ref,
                b1_ref, w2_ref, b2_ref, wzr_ref, wzf_ref, bz_ref, sc_ref,
                g_ref,
                dx_ref, danb_ref, dans_ref, dwt_ref, dw1f_ref, db1_ref,
                dw2_ref, db2_ref, dwzr_ref, dbz_ref, dsc_ref,
                sg_ref, sr_ref, *,
                hw, khw, pad, cd, n_flows):
    h, w = hw
    kh, kw = khw
    ph, pw = pad
    bt = g_ref.shape[0]
    c = g_ref.shape[-1]
    ch = c // 2
    f = w2_ref.shape[1]
    n = bt * h * w
    hp, wp = h + 2 * ph, w + 2 * pw
    np_ = bt * hp * wp

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (danb_ref, dans_ref, dwt_ref, dw1f_ref, db1_ref,
                    dw2_ref, db2_ref, dwzr_ref, dbz_ref, dsc_ref):
            ref[:] = jnp.zeros_like(ref)

    # Padded canvases for the grad tensors live in VMEM SCRATCH, assembled
    # by static-slice interior stores over a zeroed border: Mosaic CRASHES
    # (helper exit 1, no diagnostic) when concatenate-based pads of the
    # in-kernel grads coexist with the _coupling_fwd recompute's own pads
    # in one kernel (measured on v5e; each half compiles alone). The border
    # is zeroed once per grid step; every flow only rewrites the interior.
    sg_ref[:] = jnp.zeros_like(sg_ref)
    sr_ref[:] = jnp.zeros_like(sr_ref)

    def body(i, g):
        k = n_flows - 1 - i
        x = xsave_ref[k]
        an_b, an_s = anb_ref[k], ans_ref[k]
        wt = wt_ref[k]
        w1f, w1r, b1 = w1f_ref[k], w1r_ref[k], b1_ref[k]
        w2, b2 = w2_ref[k], b2_ref[k]
        wzr, wzf = wzr_ref[k], wzf_ref[k]
        bz, sc = bz_ref[k], sc_ref[k]

        # ---- recompute the flow forward ----
        y1 = an_s * (x + an_b)
        y1f = y1.reshape(n, c)
        y2 = jnp.dot(y1f.astype(cd), wt.astype(cd),
                     preferred_element_type=F32)
        ya = y2[:, :ch]
        _, ya_sp, h1, h2, h2p, convz = _coupling_fwd(
            ya, w1f, b1, w2, b2, wzr, bz, sc, hw, khw, pad, cd)

        # ---- coupling backward (grad arrives at out = [ya, yb + nn]) ----
        gf = g.reshape(n, c)
        ga, gb = gf[:, :ch], gf[:, ch:]          # gb == d(nn) == d(yb)
        escale = jnp.exp(sc * 3.0)
        dsc_ref[k] += 3.0 * jnp.sum(gb * convz * escale, axis=0)
        g_s = gb * escale
        dbz_ref[k] += jnp.sum(g_s, axis=0)
        g_s16 = g_s.astype(cd).reshape(bt, h, w, ch)

        # grad canvas: g at offset (2ph, 2pw) in a (h+4ph, w+4pw) zero field
        sg_ref[:, 2 * ph:2 * ph + h, 2 * pw:2 * pw + w, :] = g_s16
        sg = sg_ref[:]
        if kh * kw > 1:
            # tap placement (dy, dx) on the (hp, wp) grid == canvas slice
            G = jnp.concatenate(
                [sg[:, 2 * ph - dy:2 * ph - dy + hp,
                    2 * pw - dx:2 * pw - dx + wp, :].reshape(np_, -1)
                 for dy in range(kh) for dx in range(kw)], axis=-1)
        else:
            G = g_s16.reshape(np_, -1)
        dwzr_ref[k] += jnp.dot(h2p.reshape(np_, f).T, G,
                               preferred_element_type=F32)

        g_p = sg[:, ph:ph + hp, pw:pw + wp, :]
        dh2 = jnp.dot(_im2col(g_p, h, w, kh, kw), wzf,
                      preferred_element_type=F32)
        dh2 = jnp.where(h2.astype(F32) > 0, dh2, 0.0)
        db2_ref[k] += jnp.sum(dh2, axis=0)
        dh2_16 = dh2.astype(cd)

        dw2_ref[k] += jnp.dot(h1.T, dh2_16, preferred_element_type=F32)
        dh1 = jnp.dot(dh2_16, w2.T, preferred_element_type=F32)
        dh1 = jnp.where(h1.astype(F32) > 0, dh1, 0.0)
        db1_ref[k] += jnp.sum(dh1, axis=0)
        dh1_16 = dh1.astype(cd)

        cols = _im2col(ya_sp, h, w, kh, kw)
        dw1f_ref[k] += jnp.dot(cols.T, dh1_16, preferred_element_type=F32)

        r2 = jnp.dot(dh1_16, w1r,
                     preferred_element_type=F32).reshape(bt, h, w, -1)
        sr_ref[:, ph:ph + h, pw:pw + w, :] = r2
        r2p = sr_ref[:]
        dya_nn = None
        for dy in range(kh):
            for dx in range(kw):
                t = kw * dy + dx
                sl = r2p[:, 2 * ph - dy:2 * ph - dy + h,
                         2 * pw - dx:2 * pw - dx + w,
                         t * ch:(t + 1) * ch]
                dya_nn = sl if dya_nn is None else dya_nn + sl

        # ---- through split / invconv / actnorm ----
        dya = ga + dya_nn.reshape(n, ch)
        dy2 = jnp.concatenate([dya, gb], axis=-1)     # (n, c)
        dy2_16 = dy2.astype(cd)
        dwt_ref[k] += jnp.dot(y1f.astype(cd).T, dy2_16,
                              preferred_element_type=F32)
        dy1 = jnp.dot(dy2_16, wt.astype(cd).T,
                      preferred_element_type=F32).reshape(bt, h, w, c)
        dans_ref[k] += jnp.sum((dy1 * (x + an_b)).reshape(n, c), axis=0)
        dx = dy1 * an_s
        danb_ref[k] += jnp.sum(dx.reshape(n, c), axis=0)
        return dx

    # fori_loop (not a static unroll): the body holds ~30 f=512 matmul/conv
    # ops — unrolled G times the Mosaic program gets big enough to OOM the
    # remote compile helper (SIGKILL, measured). Dynamic-index RMW on the
    # grad refs compiles fine (minimal-repro verified).
    dx_ref[:] = jax.lax.fori_loop(0, n_flows, body, g_ref[:])


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------

def _pack(w1, w2, wz, cd):
    """Stacked HWIO conv weights (leading K) -> kernel layouts (XLA ops)."""
    K = w1.shape[0]
    f = w2.shape[-1]
    w1f = w1.reshape(K, -1, f).astype(cd)
    w1r = w1.transpose(0, 4, 1, 2, 3).reshape(K, f, -1).astype(cd)
    wzr = wz.transpose(0, 3, 1, 2, 4).reshape(K, f, -1).astype(cd)
    wzf = wz[:, ::-1, ::-1].transpose(0, 1, 2, 4, 3).reshape(
        K, -1, f).astype(cd)
    return w1f, w1r, wzr, wzf, w2.reshape(K, f, f).astype(cd)


def _common_sizes(x, f, K, taps, cd_bytes):
    b, h, w, c = x.shape
    per_image_fwd = h * w * f * 8 + (h + 2) * (w + 2) * f * 2 \
        + h * w * c * 8 + K * h * w * c * 4   # + the xsave tile block
    per_image_bwd = h * w * f * 14 + (h + 2) * (w + 2) * f * 2 \
        + h * w * c * 16 + K * h * w * c * 4   # + the xsave tile block
    return b, h, w, c, per_image_fwd, per_image_bwd


@functools.lru_cache(maxsize=None)
def _make_stack(khw: Tuple[int, int], pad: Tuple[int, int], cd_name,
                interpret: bool):
    kh, kw = khw
    cd = jnp.dtype(cd_name)
    taps = kh * kw

    def run_fwd(x, an_b, an_s, wt, w1, b1, w2, b2, wz, bz, sc,
                with_save: bool):
        K = an_b.shape[0]
        f = w2.shape[-1]
        b, h, w_, c, per_fwd, _ = _common_sizes(x, f, K, taps,
                                                cd.itemsize)
        w1f, w1r, wzr, wzf, w2f = _pack(w1, w2, wz, cd)
        fixed = _tree_bytes(w1f, wzr, w2f) + 4 * K * (2 * c + 2 * f + c)
        bt = _pick_bt(b, fixed, per_fwd)
        full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s))
        tile = lambda s: pl.BlockSpec(s, lambda i: (i,) + (0,) * (len(s) - 1))
        kern = functools.partial(
            _fwd_kernel if with_save else _fwd_sample_kernel,
            hw=(h, w_), khw=khw, pad=pad, cd=cd, n_flows=K)
        out_shape = [jax.ShapeDtypeStruct((b, h, w_, c), F32)]
        out_specs = [tile((bt, h, w_, c))]
        if with_save:
            out_shape.append(jax.ShapeDtypeStruct((K, b, h, w_, c), F32))
            out_specs.append(
                pl.BlockSpec((K, bt, h, w_, c),
                             lambda i: (0, i, 0, 0, 0)))
        res = pl.pallas_call(
            kern,
            grid=(b // bt,),
            in_specs=[
                tile((bt, h, w_, c)),
                full(an_b.shape), full(an_s.shape), full(wt.shape),
                full(w1f.shape), full(b1.shape), full(w2f.shape),
                full(b2.shape), full(wzr.shape), full(bz.shape),
                full(sc.shape),
            ],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(x.astype(F32), an_b, an_s, wt, w1f, b1, w2f, b2, wzr, bz, sc)
        return res if with_save else res[0]

    def run_bwd(xsave, an_b, an_s, wt, w1, b1, w2, b2, wz, bz, sc, g):
        K = an_b.shape[0]
        f = w2.shape[-1]
        b, h, w_, c, _, per_bwd = _common_sizes(g, f, K, taps, cd.itemsize)
        kh_, kw_ = khw
        ph_, pw_ = pad
        ch = c // 2
        # + the two scratch canvases (padded grad field + r2 field)
        per_bwd += ((h + 4 * ph_) * (w_ + 4 * pw_) * ch * cd.itemsize
                    + (h + 2 * ph_) * (w_ + 2 * pw_) * taps * ch * 4)
        w1f, w1r, wzr, wzf, w2f = _pack(w1, w2, wz, cd)
        fixed = _tree_bytes(w1f, w1r, wzr, wzf, w2f) \
            + 2 * _tree_bytes(w1f, wzr, w2f) \
            + 4 * K * (3 * c + 2 * f + c * c + 2 * c)
        bt = _pick_bt(b, fixed, per_bwd)
        full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s))
        tile = lambda s: pl.BlockSpec(s, lambda i: (i,) + (0,) * (len(s) - 1))
        kern = functools.partial(_bwd_kernel, hw=(h, w_), khw=khw, pad=pad,
                                 cd=cd, n_flows=K)
        ch = c // 2
        out_shape = (
            jax.ShapeDtypeStruct((b, h, w_, c), F32),        # dx
            jax.ShapeDtypeStruct((K, c), F32),               # d an_b
            jax.ShapeDtypeStruct((K, c), F32),               # d an_s
            jax.ShapeDtypeStruct((K, c, c), F32),            # d wt
            jax.ShapeDtypeStruct((K, taps * ch, f), F32),    # d w1f
            jax.ShapeDtypeStruct((K, f), F32),               # d b1
            jax.ShapeDtypeStruct((K, f, f), F32),            # d w2
            jax.ShapeDtypeStruct((K, f), F32),               # d b2
            jax.ShapeDtypeStruct((K, f, taps * ch), F32),    # d wzr
            jax.ShapeDtypeStruct((K, ch), F32),              # d bz
            jax.ShapeDtypeStruct((K, ch), F32),              # d sc
        )
        out_specs = (tile((bt, h, w_, c)),) + tuple(
            full(s.shape) for s in out_shape[1:])
        return pl.pallas_call(
            kern,
            grid=(b // bt,),
            in_specs=[
                pl.BlockSpec((K, bt, h, w_, c),
                             lambda i: (0, i, 0, 0, 0)),
                full(an_b.shape), full(an_s.shape), full(wt.shape),
                full(w1f.shape), full(w1r.shape), full(b1.shape),
                full(w2f.shape), full(b2.shape), full(wzr.shape),
                full(wzf.shape), full(bz.shape), full(sc.shape),
                tile((bt, h, w_, c)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((bt, h + 4 * ph_, w_ + 4 * pw_, ch), cd),
                pltpu.VMEM((bt, h + 2 * ph_, w_ + 2 * pw_, taps * ch),
                           F32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(xsave, an_b, an_s, wt, w1f, w1r, b1, w2f, b2, wzr, wzf, bz,
          sc, g.astype(F32))

    @jax.custom_vjp
    def f(x, an_b, an_s, wt, w1, b1, w2, b2, wz, bz, sc):
        return run_fwd(x, an_b, an_s, wt, w1, b1, w2, b2, wz, bz, sc,
                       with_save=False)

    def f_fwd(x, an_b, an_s, wt, w1, b1, w2, b2, wz, bz, sc):
        y, xsave = run_fwd(x, an_b, an_s, wt, w1, b1, w2, b2, wz, bz, sc,
                           with_save=True)
        return y, (xsave, an_b, an_s, wt, w1, b1, w2, b2, wz, bz, sc)

    def f_bwd(res, g):
        xsave, an_b, an_s, wt, w1, b1, w2, b2, wz, bz, sc = res
        (dx, danb, dans, dwt, dw1f, db1, dw2, db2, dwzr, dbz, dsc) = \
            run_bwd(xsave, an_b, an_s, wt, w1, b1, w2, b2, wz, bz, sc, g)
        K = w1.shape[0]
        f_ = w2.shape[-1]
        ch = w1.shape[3]
        # unpack the packed weight grads back to stacked HWIO (XLA, free)
        dw1 = dw1f.reshape(w1.shape)
        dwz = dwzr.reshape(K, f_, kh, kw, ch).transpose(0, 2, 3, 1, 4)
        return (dx.astype(F32), danb.astype(an_b.dtype),
                dans.astype(an_s.dtype), dwt.astype(wt.dtype),
                dw1.astype(w1.dtype), db1.astype(b1.dtype),
                dw2.reshape(w2.shape).astype(w2.dtype),
                db2.astype(b2.dtype), dwz.astype(wz.dtype),
                dbz.astype(bz.dtype), dsc.astype(sc.dtype))

    f.defvjp(f_fwd, f_bwd)
    return f


def glow_flow_stack(flows, wt_all, x, khw: Tuple[int, int],
                    pad: Tuple[int, int], compute_dtype=jnp.bfloat16,
                    interpret: bool = False, chunk: int = None):
    """Run ALL K flows of one block on x (B, H, W, C), VMEM-resident.

    flows: the stacked flow params of models/glow.py ({'actnorm', 'invconv',
    'coupling'} with leading K). wt_all: (K, c, c) — TRANSPOSED PLU weights
    ``vmap(plu_weight)(invconv).swapaxes(1,2)`` assembled by the caller in
    XLA so invconv grads flow through the assembly by ordinary autodiff.
    Returns y (B, H, W, C) f32. Logdet is the caller's (params-only).

    Flows run in chunks of G per pallas_call (G = ``chunk`` or auto-sized so
    the per-call weight+grad residency fits VMEM); chunk calls chain in XLA,
    each boundary costing one HBM round-trip of the small c-wide activation.
    """
    kh, kw = khw
    K, c, _ = wt_all.shape
    b, h, w, _ = x.shape
    f = flows["coupling"]["conv2"]["w"].shape[-1]
    cdb = jnp.dtype(compute_dtype).itemsize
    g = chunk or _pick_chunk(K, c, f, kh * kw, h * w * c * 4, cdb)
    fn = _make_stack(tuple(khw), tuple(pad),
                     jnp.dtype(compute_dtype).name, interpret)
    cpl = flows["coupling"]
    y = x
    for s in range(0, K, g):
        sl = lambda a: a[s:s + g]
        y = fn(y, sl(flows["actnorm"]["b"]), sl(flows["actnorm"]["s"]),
               sl(wt_all), sl(cpl["conv1"]["w"]), sl(cpl["conv1"]["b"]),
               sl(cpl["conv2"]["w"]), sl(cpl["conv2"]["b"]),
               sl(cpl["zero"]["w"]), sl(cpl["zero"]["b"]),
               sl(cpl["zero"]["scale"]))
    return y
