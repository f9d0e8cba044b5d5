"""Fused Glow additive-coupling NN as a Pallas TPU kernel (+ custom VJP).

The reference coupling (nf_code.py:190-242) is Conv3x3(512) -> ReLU ->
Conv1x1(512) -> ReLU -> ZeroConv3x3 (value-1 pad, exp(3*scale)). Executed as
separate XLA convs, the two 512-channel intermediates round-trip HBM every
flow — at the reference config (K=32, L=4, 64x64, b16) that is ~17 MB x 2
per flow per direction, the dominant traffic of a step that measures at only
24% of the HBM roofline (BASELINE.md). This kernel computes the whole
coupling NN for a tile of images entirely in VMEM.

MXU packing: the flow channels are tiny (cin/cout = 6..48) while the MXU
tiles are 128x128, so naive per-tap matmuls waste >80% of the array on
lane padding. Three rearrangements keep the array busy:

* conv1 / dh2: im2col the kh*kw taps into ONE (pixels, taps*cin) matmul
  (K-merge) instead of taps N-padded ones,
* zeroconv / dya: shared-LHS N-pack — r = x_flat @ W_packed(f, taps*cout)
  computed once on the padded grid, the conv output then assembled as
  taps shifted slice-adds of r (VPU work, no scatter),
* dWz: all-tap weight grad as h2p_flat.T @ G where G holds taps shifted
  placements of the output grad (one matmul, N = taps*cout).

All weight (un)packing happens outside the kernel in XLA where it fuses
for free; the kernels see flat (K, N)-shaped operands only.

The custom VJP saves only (ya, weights) and recomputes h1/h2 inside the
backward (flash-attention-style). The backward runs as TWO kernels — a
monolithic one peaks ~17 MB of VMEM at the 32x32/f512 block (over the
16 MB scope): B1 recomputes the forward and produces the zeroconv grads +
dh2 (staging h1/dh2 to HBM as bf16), B2 consumes them for the conv2/conv1
grads + dya. Weight grads accumulate across grid steps in revisited blocks.

Matmuls run with bf16 operands and f32 accumulation, matching the stock
path's semantics on TPU (the stock conv chain computes in
``compute_dtype``/bf16, and TPU's default f32 conv truncates operands to
bf16 anyway; the ZeroConv input is exactly-bf16-valued in the stock path
too, models/glow.py:_coupling_nn).

Use ``glow_coupling_nn`` (dispatches Pallas vs the XLA reference chain);
``interpret=True`` runs the same kernels on CPU for tests.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BF16 = jnp.bfloat16

# VMEM budget for the per-tile intermediates (h1 + h2p + views). Mosaic's
# stack accounting runs ~3x this estimate (relayout copies for the shifted
# slices), so the pallas_calls raise the scoped-vmem limit (default 16 MiB)
# to _VMEM_LIMIT — v5e has 128 MiB of physical VMEM.
_VMEM_BUDGET = 12 * 1024 * 1024
_VMEM_LIMIT = 96 * 1024 * 1024

# f-width intermediates live per image, by kernel (see each kernel's body):
#   fwd: acc f32 (4) + h1/h2 bf16 (2+2)            = 8  B/elem + padded h2p
#   b1 : acc 4 + h1 2 + h2 2 + dh2 4 + dh2_16 2    = 14 B/elem + padded h2p
#   b2 : h1 2 + dh2 2 + dh1 4 + dh1_16 2           = 10 B/elem + padded dh1_p
_PER_ELEM = {"fwd": 8, "b1": 14, "b2": 10}


def _batch_tile(b: int, h: int, w: int, f: int, mode: str = "fwd") -> int:
    """Largest divisor of b whose per-tile live buffers fit the VMEM budget."""
    hp, wp = h + 2, w + 2
    per_image = h * w * f * _PER_ELEM[mode] + hp * wp * f * 2
    bt = max(1, _VMEM_BUDGET // max(per_image, 1))
    while b % bt:
        bt -= 1
    return bt


def _pad_asym(x, top: int, bottom: int, left: int, right: int, value: float):
    """Constant-pad the two spatial dims via concatenate (Mosaic lowers
    concatenate; `.at[].set` would become an unsupported scatter)."""
    bt, h, w, c = x.shape
    if left or right:
        parts = ([jnp.full((bt, h, left, c), value, x.dtype)] if left else
                 []) + [x] + ([jnp.full((bt, h, right, c), value, x.dtype)]
                              if right else [])
        x = jnp.concatenate(parts, axis=2)
    if top or bottom:
        wt = w + left + right
        parts = ([jnp.full((bt, top, wt, c), value, x.dtype)] if top else
                 []) + [x] + ([jnp.full((bt, bottom, wt, c), value, x.dtype)]
                              if bottom else [])
        x = jnp.concatenate(parts, axis=1)
    return x


def _pad_hw(x, ph: int, pw: int, value: float):
    return _pad_asym(x, ph, ph, pw, pw, value)


def _im2col(xp, h: int, w: int, kh: int, kw: int):
    """(bt, hp, wp, c) -> (bt*h*w, kh*kw*c): tap slices stacked tap-major on
    the channel axis, matching w.reshape(kh*kw*c, f).

    Each slice is flattened to 2-D BEFORE the lane-dim concatenate: the
    spatially shifted slices carry different sublane offsets in their Mosaic
    layouts, and tpu.concatenate rejects offset mismatches on non-concat
    dims; the 2-D reshape canonicalises each operand first."""
    bt = xp.shape[0]
    cols = [xp[:, dy:dy + h, dx:dx + w, :].reshape(bt * h * w, -1)
            for dy in range(kh) for dx in range(kw)]
    if len(cols) == 1:
        return cols[0]
    return jnp.concatenate(cols, axis=-1)


def _shift_sum(r, h: int, w: int, kh: int, kw: int, c: int):
    """Assemble a conv output from the shared-LHS N-pack product
    r (bt, hp, wp, taps*c): out[y, x] = sum_tap r[y+dy, x+dx, tap]."""
    out = None
    for dy in range(kh):
        for dx in range(kw):
            t = kw * dy + dx
            sl = r[:, dy:dy + h, dx:dx + w, t * c:(t + 1) * c]
            out = sl if out is None else out + sl
    return out


def _recompute_fwd(ya, w1f_ref, b1_ref, w2_ref, b2_ref, n, cd,
                   hw, khw, pad):
    """conv1 -> ReLU -> conv2 -> ReLU from a padded input tile; shared by
    the forward and B1 kernels. The bf16 h1/h2 double as the ReLU masks
    (h>0 <=> pre>0 up to bf16 denormal rounding) so the f32
    pre-activations need not stay live."""
    h, w = hw
    kh, kw = khw
    cols = _im2col(ya, h, w, kh, kw)                 # (n, taps*cin)
    acc = jnp.dot(cols, w1f_ref[:], preferred_element_type=F32)
    h1 = jnp.maximum(acc + b1_ref[:].astype(F32), 0.0).astype(cd)
    h2 = jnp.maximum(jnp.dot(h1, w2_ref[:], preferred_element_type=F32)
                     + b2_ref[:].astype(F32), 0.0).astype(cd)
    return h1, h2


def _zeroconv_fwd(h2, wzr_ref, bz_ref, bt, hw, khw, pad, cout, cd):
    """Zero-conv via the shared-LHS N-pack: r = h2p_flat @ Wz(f, taps*cout)
    on the value-1-padded grid, output = taps shifted slice-adds."""
    h, w = hw
    kh, kw = khw
    ph, pw = pad
    f = h2.shape[-1]
    h2p = _pad_hw(h2.reshape(bt, h, w, f), ph, pw, 1.0)
    hp, wp = h + 2 * ph, w + 2 * pw
    r = jnp.dot(h2p.reshape(bt * hp * wp, f), wzr_ref[:],
                preferred_element_type=F32).reshape(bt, hp, wp, -1)
    convz = _shift_sum(r, h, w, kh, kw, cout) + bz_ref[:].astype(F32)
    return convz.reshape(bt * h * w, cout), h2p


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(ya_ref, w1f_ref, b1_ref, w2_ref, b2_ref, wzr_ref, bz_ref,
                sc_ref, out_ref, *, hw: Tuple[int, int],
                khw: Tuple[int, int], pad: Tuple[int, int], cd):
    h, w = hw
    bt = out_ref.shape[0]
    cout = out_ref.shape[-1]
    n = bt * h * w
    h1, h2 = _recompute_fwd(ya_ref[:], w1f_ref, b1_ref, w2_ref, b2_ref,
                            n, cd, hw, khw, pad)
    convz, _ = _zeroconv_fwd(h2, wzr_ref, bz_ref, bt, hw, khw, pad, cout, cd)
    out = convz * jnp.exp(sc_ref[:] * 3.0)
    out_ref[:] = out.reshape(bt, h, w, cout)


def _fwd_pallas(ya_p, w1f, b1, w2, b2, wzr, bz, scale, hw, khw, pad,
                cout, cd, interpret):
    h, w = hw
    b = ya_p.shape[0]
    f = w2.shape[0]
    bt = _batch_tile(b, h, w, f)
    kern = functools.partial(_fwd_kernel, hw=hw, khw=khw, pad=pad, cd=cd)
    full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s))
    return pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt,) + ya_p.shape[1:], lambda i: (i, 0, 0, 0)),
            full(w1f.shape), full(b1.shape), full(w2.shape), full(b2.shape),
            full(wzr.shape), full(bz.shape), full(scale.shape),
        ],
        out_specs=pl.BlockSpec((bt, h, w, cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), F32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(ya_p, w1f, b1, w2, b2, wzr, bz, scale)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _bwd1_kernel(ya_ref, w1f_ref, b1_ref, w2_ref, b2_ref, wzr_ref,
                 wzf_ref, bz_ref, sc_ref, g_ref, h1_ref, dh2_ref, dwz_ref,
                 dbz_ref, db2_ref, dsc_ref, *, hw: Tuple[int, int],
                 khw: Tuple[int, int], pad: Tuple[int, int], cd):
    h, w = hw
    kh, kw = khw
    ph, pw = pad
    bt = g_ref.shape[0]
    f = w2_ref.shape[0]
    cout = g_ref.shape[-1]
    n = bt * h * w
    hp, wp = h + 2 * ph, w + 2 * pw

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwz_ref[:] = jnp.zeros_like(dwz_ref)
        dbz_ref[:] = jnp.zeros_like(dbz_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dsc_ref[:] = jnp.zeros_like(dsc_ref)

    h1, h2 = _recompute_fwd(ya_ref[:], w1f_ref, b1_ref, w2_ref, b2_ref,
                            n, cd, hw, khw, pad)
    h1_ref[:] = h1.reshape(bt, h, w, f)
    convz, h2p = _zeroconv_fwd(h2, wzr_ref, bz_ref, bt, hw, khw, pad,
                               cout, cd)

    # --- backward through scale + zeroconv ---
    g = g_ref[:].reshape(n, cout)
    escale = jnp.exp(sc_ref[:] * 3.0)
    dsc_ref[:] += 3.0 * jnp.sum(g * convz * escale, axis=0)
    g_s = g * escale                                  # d(convz)
    dbz_ref[:] += jnp.sum(g_s, axis=0)
    g_s16 = g_s.astype(cd).reshape(bt, h, w, cout)

    # dWz for ALL taps in one matmul: G holds taps shifted placements of
    # the output grad on the padded grid (dwz[tap] = h2p.T @ shift(g, tap));
    # operands flattened to 2-D before the lane concat (see _im2col)
    np_ = bt * hp * wp
    if kh * kw > 1:
        G = jnp.concatenate(
            [_pad_asym(g_s16, dy, 2 * ph - dy, dx, 2 * pw - dx,
                       0.0).reshape(np_, -1)
             for dy in range(kh) for dx in range(kw)], axis=-1)
    else:
        G = g_s16.reshape(np_, -1)
    dwz_ref[:] += jnp.dot(h2p.reshape(np_, f).T, G,
                          preferred_element_type=F32)

    # dh2 = correlation of the zero-padded grad with the flipped kernel,
    # as ONE im2col matmul (the value-1 pad region's gradient flows
    # nowhere, so computing dh2 directly on the interior is exact)
    g_p = _pad_hw(g_s16, ph, pw, 0.0)
    dh2 = jnp.dot(_im2col(g_p, h, w, kh, kw), wzf_ref[:],
                  preferred_element_type=F32)
    # masks compared in f32 — Mosaic rejects bf16 vector cmpf on this target
    dh2 = jnp.where(h2.astype(F32) > 0, dh2, 0.0)
    db2_ref[:] += jnp.sum(dh2, axis=0)
    dh2_ref[:] = dh2.astype(cd).reshape(bt, h, w, f)


def _bwd2_kernel(ya_ref, w1r_ref, w2_ref, h1_ref, dh2_ref, dya_ref,
                 dw1_ref, db1_ref, dw2_ref, *, hw: Tuple[int, int],
                 khw: Tuple[int, int], pad: Tuple[int, int], cd):
    h, w = hw
    kh, kw = khw
    ph, pw = pad
    bt = dya_ref.shape[0]
    f = w2_ref.shape[0]
    cin = dya_ref.shape[-1]
    n = bt * h * w

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    h1 = h1_ref[:].reshape(n, f)
    dh2_16 = dh2_ref[:].reshape(n, f)

    dw2_ref[:] += jnp.dot(h1.T, dh2_16, preferred_element_type=F32)
    dh1 = jnp.dot(dh2_16, w2_ref[:].T, preferred_element_type=F32)
    dh1 = jnp.where(h1.astype(F32) > 0, dh1, 0.0)
    db1_ref[:] += jnp.sum(dh1, axis=0)
    dh1_16 = dh1.astype(cd)

    # dW1 for all taps in one matmul: (taps*cin, n) @ (n, f)
    cols = _im2col(ya_ref[:], h, w, kh, kw)          # (n, taps*cin)
    dw1_ref[:] += jnp.dot(cols.T, dh1_16, preferred_element_type=F32)

    # dya via the shared-LHS N-pack: r2 = dh1 @ W1r(f, taps*cin) on the
    # grid, dya = flipped-tap shifted slice-adds of the zero-padded r2
    r2 = jnp.dot(dh1_16, w1r_ref[:],
                 preferred_element_type=F32).reshape(bt, h, w, -1)
    r2p = _pad_hw(r2, ph, pw, 0.0)
    dya = None
    for dy in range(kh):
        for dx in range(kw):
            t = kw * dy + dx
            sl = r2p[:, 2 * ph - dy:2 * ph - dy + h,
                     2 * pw - dx:2 * pw - dx + w, t * cin:(t + 1) * cin]
            dya = sl if dya is None else dya + sl
    dya_ref[:] = dya


def _bwd_pallas(ya_p, w1f, w1r, b1, w2, b2, wzr, wzf, bz, scale, g, hw,
                khw, pad, cd, interpret):
    h, w = hw
    b = ya_p.shape[0]
    f = w2.shape[0]
    cin = ya_p.shape[-1]
    full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s))
    tile = lambda bt, s: pl.BlockSpec((bt,) + s, lambda i: (i, 0, 0, 0))

    bt1 = _batch_tile(b, h, w, f, mode="b1")
    k1 = functools.partial(_bwd1_kernel, hw=hw, khw=khw, pad=pad, cd=cd)
    h1_all, dh2_all, dwz, dbz, db2, dsc = pl.pallas_call(
        k1,
        grid=(b // bt1,),
        in_specs=[
            tile(bt1, ya_p.shape[1:]),
            full(w1f.shape), full(b1.shape), full(w2.shape), full(b2.shape),
            full(wzr.shape), full(wzf.shape), full(bz.shape),
            full(scale.shape),
            tile(bt1, (h, w, g.shape[-1])),
        ],
        out_specs=(
            tile(bt1, (h, w, f)), tile(bt1, (h, w, f)),
            full((f, wzr.shape[-1])), full(bz.shape), full(b2.shape),
            full(scale.shape),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, f), cd),       # h1 (staged)
            jax.ShapeDtypeStruct((b, h, w, f), cd),       # dh2 (staged)
            jax.ShapeDtypeStruct((f, wzr.shape[-1]), F32),  # dwz packed
            jax.ShapeDtypeStruct(bz.shape, F32),
            jax.ShapeDtypeStruct(b2.shape, F32),
            jax.ShapeDtypeStruct(scale.shape, F32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(ya_p, w1f, b1, w2, b2, wzr, wzf, bz, scale, g)

    bt2 = _batch_tile(b, h, w, f, mode="b2")
    k2 = functools.partial(_bwd2_kernel, hw=hw, khw=khw, pad=pad, cd=cd)
    dya, dw1, db1, dw2 = pl.pallas_call(
        k2,
        grid=(b // bt2,),
        in_specs=[
            tile(bt2, ya_p.shape[1:]),
            full(w1r.shape), full(w2.shape),
            tile(bt2, (h, w, f)), tile(bt2, (h, w, f)),
        ],
        out_specs=(
            tile(bt2, (h, w, cin)),
            full(w1f.shape), full(b1.shape), full(w2.shape),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, cin), F32),    # dya (unpadded)
            jax.ShapeDtypeStruct(w1f.shape, F32),         # dw1 packed
            jax.ShapeDtypeStruct(b1.shape, F32),
            jax.ShapeDtypeStruct(w2.shape, F32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(ya_p, w1r, w2, h1_all, dh2_all)
    return dya, dw1, db1, dw2, db2, dwz, dbz, dsc


# ---------------------------------------------------------------------------
# custom-VJP wrapper + dispatcher
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _make_fused(khw: Tuple[int, int], pad: Tuple[int, int], cd,
                interpret: bool):
    kh, kw = khw
    ph, pw = pad
    cd = jnp.dtype(cd)

    def prep(ya, w1, w2, wz):
        """Pad the input and pack the weights into the kernel layouts (all
        XLA ops — they fuse into the surrounding graph for free):
        w1f (taps*cin, f) im2col weights; w1r (f, taps*cin) tap-transposes
        N-stacked; wzr (f, taps*cout) N-stacked; wzf (taps*cout, f) flipped
        taps im2col-stacked."""
        ya_p = jnp.pad(ya, ((0, 0), (ph, ph), (pw, pw), (0, 0))).astype(cd)
        f = w2.shape[-1]
        w1f = w1.reshape(-1, f).astype(cd)
        w1r = w1.transpose(3, 0, 1, 2).reshape(f, -1).astype(cd)
        wzr = wz.transpose(2, 0, 1, 3).reshape(f, -1).astype(cd)
        wzf = wz[::-1, ::-1].transpose(0, 1, 3, 2).reshape(-1, f).astype(cd)
        return ya_p, w1f, w1r, wzr, wzf, w2.reshape(f, f).astype(cd)

    def run_fwd(ya, w1, b1, w2, b2, wz, bz, scale):
        hw = (ya.shape[1], ya.shape[2])
        ya_p, w1f, _, wzr, _, w2c = prep(ya, w1, w2, wz)
        return _fwd_pallas(ya_p, w1f, b1, w2c, b2, wzr, bz, scale,
                           hw, khw, pad, wz.shape[-1], cd, interpret)

    @jax.custom_vjp
    def f(ya, w1, b1, w2, b2, wz, bz, scale):
        return run_fwd(ya, w1, b1, w2, b2, wz, bz, scale)

    def f_fwd(ya, w1, b1, w2, b2, wz, bz, scale):
        out = run_fwd(ya, w1, b1, w2, b2, wz, bz, scale)
        return out, (ya, w1, b1, w2, b2, wz, bz, scale)

    def f_bwd(res, g):
        ya, w1, b1, w2, b2, wz, bz, scale = res
        hw = (ya.shape[1], ya.shape[2])
        ya_p, w1f, w1r, wzr, wzf, w2c = prep(ya, w1, w2, wz)
        dya, dw1, db1, dw2, db2, dwz, dbz, dsc = _bwd_pallas(
            ya_p, w1f, w1r, b1, w2c, b2, wzr, wzf, bz, scale,
            g.astype(F32), hw, khw, pad, cd, interpret)
        f = w2.shape[-1]
        cout = wz.shape[-1]
        # unpack the packed weight grads back to HWIO (XLA reshapes, free)
        dw1 = dw1.reshape(w1.shape)
        dwz = dwz.reshape(f, kh, kw, cout).transpose(1, 2, 0, 3)
        return (dya.astype(ya.dtype), dw1.astype(w1.dtype),
                db1.astype(b1.dtype), dw2.reshape(w2.shape).astype(w2.dtype),
                db2.astype(b2.dtype), dwz.astype(wz.dtype),
                dbz.astype(bz.dtype), dsc.astype(scale.dtype))

    f.defvjp(f_fwd, f_bwd)
    return f


def glow_coupling_nn(p, ya, khw: Tuple[int, int], pad: Tuple[int, int],
                     compute_dtype=BF16, interpret: bool = False):
    """Fused coupling NN: p = {'conv1': {w,b}, 'conv2': {w,b},
    'zero': {w,b,scale}}; returns NN(ya) in f32 (to be added to yb).
    ``compute_dtype`` sets the matmul operand dtype (accumulation is
    always f32) — bf16 matches the image config, f32 the EEG config."""
    f = _make_fused(tuple(khw), tuple(pad), jnp.dtype(compute_dtype).name,
                    interpret)
    return f(ya, p["conv1"]["w"], p["conv1"]["b"], p["conv2"]["w"],
             p["conv2"]["b"], p["zero"]["w"], p["zero"]["b"],
             p["zero"]["scale"])
