"""Glow normalizing flow (2-D images and 1-D EEG variants) — functional,
scan-compiled.

Capability parity with nf_code.py:20-538 and flow_eeg.py:74-336, re-designed
TPU-first. The reference (and a naive port) unrolls K*L = 128 flow modules
into the graph; on TPU that explodes trace/compile time and bloats the
executable. Here the K flows of a block are HOMOGENEOUS, so their parameters
are stacked along a leading axis and the block body is ONE ``lax.scan`` over
them — a 32x smaller graph with identical math. The reverse pass is the same
scan with ``reverse=True``. Parameters are a plain pytree (no module
framework), which also makes the data-dependent ActNorm initialisation a
straightforward scan that emits the per-flow statistics.

Variants (one implementation, a config switch):
* ``variant='image'`` (nf_code.py): 2x2 space-to-depth squeeze (x4 channels),
  3x3/1x1 coupling convs, channel count doubling per block.
* ``variant='eeg'`` (flow_eeg.py): squeeze factor 2 along time only
  (flow_eeg.py:229-233), (3,1)/(1,1) convs padded only on the time axis
  (flow_eeg.py:89-96), constant per-block channels (flow_eeg.py:309-313).

Per-layer semantics (reference cites):
* ActNorm (nf_code.py:28-91): y = s*(x+b); logdet = H*W*sum(log|s|);
  init b=-mean, s=1/(std_unbiased+1e-6) from the first batch.
* Invertible 1x1 conv (nf_code.py:122-187): PLU parameterisation; P and
  sign(s) are buffers (stop-gradient); logdet = H*W*sum(log|s|); reverse via
  explicit inverse. float32 throughout (SURVEY.md §7 numerics risk).
* Additive coupling (nf_code.py:190-242): NN = Conv3x3(512, N(0,0.05), b=0)
  -> ReLU -> Conv1x1(512, N(0,0.05), b=0) -> ReLU -> ZeroConv; logdet = 0.
* ZeroConv (nf_code.py:94-119): VALID conv on value-1-padded input,
  zero-init weight+bias, output scaled by exp(3*scale).
* FlowBlock (nf_code.py:369-456): squeeze -> K flows -> split with a
  ZeroConv prior -> gaussian log-prob of the split-off z; final block priors
  on zeros. GlowModel (nf_code.py:459-505): L blocks, z list in/out.

The reference's dead ``my*`` rewrites (nf_code.py:248-329) and stray
``breakpoint()`` artifacts (nf_code.py:447,587,684) are not reproduced.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

F32 = jnp.float32


# ---------------------------------------------------------------------------
# Gaussian helpers (nf_code.py:20-25)
# ---------------------------------------------------------------------------

def gaussian_log_p(x, mean, log_sd):
    return (-0.5 * math.log(2 * math.pi) - log_sd
            - 0.5 * jnp.square(x - mean) / jnp.exp(2.0 * log_sd))


def gaussian_sample(eps, mean, log_sd):
    return mean + jnp.exp(log_sd) * eps


# ---------------------------------------------------------------------------
# Squeeze (channel ordering matches the torch reshape for checkpoint import:
# nf_code.py:401-405 / flow_eeg.py:229-233)
# ---------------------------------------------------------------------------

def squeeze2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel = c*4 + a*2 + s."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // 2, w // 2, c * 4)


def unsqueeze2d(x):
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * 2, w * 2, c)


def squeeze_time(x):
    """EEG: (B, T, 1, C) -> (B, T/2, 1, 2C), channel = c*2 + a."""
    b, t, w, c = x.shape
    x = x.reshape(b, t // 2, 2, w, c)
    x = x.transpose(0, 1, 3, 4, 2)
    return x.reshape(b, t // 2, w, c * 2)


def unsqueeze_time(x):
    b, t, w, c2 = x.shape
    c = c2 // 2
    x = x.reshape(b, t, w, c, 2)
    x = x.transpose(0, 1, 4, 2, 3)
    return x.reshape(b, t * 2, w, c)


# ---------------------------------------------------------------------------
# Parameter initialisation (plain pytrees)
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout, std=0.05):
    return {"w": jax.random.normal(key, (kh, kw, cin, cout), F32) * std,
            "b": jnp.zeros((cout,), F32)}


def _zeroconv_init(kh, kw, cin, cout):
    return {"w": jnp.zeros((kh, kw, cin, cout), F32),
            "b": jnp.zeros((cout,), F32),
            "scale": jnp.zeros((cout,), F32)}


def _plu_init(key, c):
    """Random rotation -> PLU pieces (nf_code.py:139-157)."""
    w = jax.random.normal(key, (c, c), F32)
    q, _ = jnp.linalg.qr(w)
    p, l, u = jax.scipy.linalg.lu(q)
    s = jnp.diag(u)
    return {"P": p, "L": l, "U": jnp.triu(u, 1),
            "log_s": jnp.log(jnp.abs(s)), "s_sign": jnp.sign(s)}


def _flow_init(key, channels, filter_size, kh, kw):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "actnorm": {"b": jnp.zeros((channels,), F32),
                    "s": jnp.ones((channels,), F32)},
        "invconv": _plu_init(k1, channels),
        "coupling": {
            "conv1": _conv_init(k2, kh, kw, channels // 2, filter_size),
            "conv2": _conv_init(k3, 1, 1, filter_size, filter_size),
            "zero": _zeroconv_init(kh, kw, filter_size, channels // 2),
        },
    }


@dataclasses.dataclass(frozen=True)
class GlowConfigBase:
    in_channels: int = 3
    n_flows: int = 32
    n_blocks: int = 4
    variant: str = "image"           # 'image' | 'eeg'
    filter_size: int = 512
    compute_dtype: Any = F32         # coupling conv compute dtype

    @property
    def squeeze_factor(self):
        return 4 if self.variant == "image" else 2

    @property
    def kernel(self):
        return (3, 3) if self.variant == "image" else (3, 1)

    @property
    def pad(self):
        return (((1, 1), (1, 1)) if self.variant == "image"
                else ((1, 1), (0, 0)))

    def block_in_channels(self) -> List[int]:
        chs, ch = [], self.in_channels
        for i in range(self.n_blocks):
            chs.append(ch)
            if self.variant == "image" and i < self.n_blocks - 1:
                ch *= 2              # nf_code.py:478-480; EEG constant
        return chs


class Glow:
    """Functional Glow. ``params`` layout:
    {"block{i}": {"flows": <stacked over K>, "prior": zeroconv}}."""

    def __init__(self, in_channels=3, n_flows=32, n_blocks=4,
                 variant="image", filter_size=512, compute_dtype=F32,
                 remat=False, fused_coupling=False, flow_stack=False,
                 scan_unroll=1, pp_mesh=None, pp_microbatches=2):
        self.cfg = GlowConfigBase(in_channels, n_flows, n_blocks, variant,
                                  filter_size, compute_dtype)
        # jax.checkpoint on the per-flow scan body: activation memory drops
        # from O(K) per block to O(1) (+1 recompute in backward) — at
        # batch 256 the K=32 L=4 step needs 36G of HBM without it vs 15.75G
        # available (benchmarks/glow_batch_scaling.py).
        self.remat = remat
        # Pallas fused coupling NN (ops/glow_coupling.py): conv1 -> relu ->
        # conv2 -> relu -> zeroconv entirely in VMEM; removes the 512-wide
        # intermediates' HBM round trips that cap the scan at ~24% of the
        # HBM roofline (BASELINE.md Glow row).
        self.fused_coupling = fused_coupling
        # Strongest form: the ENTIRE K-flow stack of a block as ONE
        # Pallas kernel per direction (ops/glow_flow_stack.py) — the
        # activation never leaves VMEM between flows. Training forward
        # only; ActNorm-init and the reverse/sampling path keep the
        # per-flow code. True = every block; an int = only blocks whose
        # squeezed position count h*w is <= that threshold (the small
        # deep blocks, where the per-flow scan is launch-latency-bound
        # while XLA's large-matmul code wins the big early blocks —
        # benchmarks/glow_fused_bench.py --modes stock stack).
        self.flow_stack = flow_stack
        # lax.scan unroll for the K-flow chain (fwd + reverse): >1 inlines
        # that many flow bodies per loop iteration so XLA can fuse across
        # flow boundaries (actnorm of flow i+1 into the coupling add of
        # flow i) and amortise loop overhead — targets the launch-bound
        # small-batch regime identified by benchmarks/glow_flops.py.
        self.scan_unroll = int(scan_unroll)
        # Pipeline parallelism: with a Mesh whose ``model`` axis has p > 1
        # devices, every block's K-flow chain runs as a GPipe ring
        # (parallel/pipeline_parallel.py) — stage d holds flows
        # [d*K/p, (d+1)*K/p) and microbatches stream stage-to-stage over
        # ppermute. Training forward only (ActNorm init and the reverse /
        # sampling path keep the sequential per-flow scan); gradients flow
        # through scan+ppermute by ordinary autodiff. The flow logdet is
        # data-independent (additive couplings, nf_code.py:229-231), so the
        # batched ld_all precompute stays exact under the pipeline.
        self.pp_mesh = pp_mesh
        self.pp_microbatches = int(pp_microbatches)

    def _use_flow_stack(self, hw: int) -> bool:
        fs = self.flow_stack
        if fs is True:
            return True
        if fs is False or fs is None:
            return False
        return hw <= int(fs)

    # -- init ---------------------------------------------------------------
    def init(self, key: jax.Array) -> Dict:
        cfg = self.cfg
        kh, kw = cfg.kernel
        params = {}
        for i, ch in enumerate(cfg.block_in_channels()):
            sq = ch * cfg.squeeze_factor
            key, k_flows, k_prior = jax.random.split(key, 3)
            flow_keys = jax.random.split(k_flows, cfg.n_flows)
            flows = jax.vmap(
                lambda k: _flow_init(k, sq, cfg.filter_size, kh, kw)
            )(flow_keys)
            split = i < cfg.n_blocks - 1
            prior = (_zeroconv_init(kh, kw, sq // 2, sq) if split
                     else _zeroconv_init(kh, kw, sq, sq * 2))
            params[f"block{i}"] = {"flows": flows, "prior": prior}
        return params

    # -- primitive layers ---------------------------------------------------
    def _conv(self, p, x, pad=None, dtype=None):
        dtype = dtype or F32
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), p["w"].astype(dtype), (1, 1),
            padding=pad if pad is not None else "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + p["b"].astype(dtype)

    def _zeroconv(self, p, x):
        """Value-1 padding + VALID conv + exp(3*scale) (nf_code.py:94-119)."""
        ph, pw = self.cfg.pad
        x = jnp.pad(x, ((0, 0), ph, pw, (0, 0)), constant_values=1.0)
        y = self._conv(p, x)
        return y * jnp.exp(p["scale"] * 3.0)

    def _coupling_nn(self, p, xa):
        if self.fused_coupling:
            from vgd_tpu.ops.glow_coupling import glow_coupling_nn
            kh, kw = self.cfg.kernel
            (ph, _), (pw, _) = self.cfg.pad
            return glow_coupling_nn(
                p, xa.astype(F32), (kh, kw), (ph, pw),
                compute_dtype=self.cfg.compute_dtype,
                interpret=jax.default_backend() != "tpu")
        cd = self.cfg.compute_dtype
        h = jax.nn.relu(self._conv(p["conv1"], xa, self.cfg.pad, cd))
        h = jax.nn.relu(self._conv(p["conv2"], h, "VALID", cd))
        return self._zeroconv(p["zero"], h.astype(F32))

    @staticmethod
    def _plu_weight(p):
        c = p["L"].shape[0]
        eye = jnp.eye(c, dtype=F32)
        l_mask = jnp.tril(jnp.ones((c, c), F32), -1)
        u_mask = jnp.triu(jnp.ones((c, c), F32), 1)
        P = jax.lax.stop_gradient(p["P"])
        s_sign = jax.lax.stop_gradient(p["s_sign"])
        return (P @ (p["L"] * l_mask + eye)
                @ (p["U"] * u_mask + jnp.diag(s_sign * jnp.exp(p["log_s"]))))

    # -- single flow --------------------------------------------------------
    def _flow_fwd(self, p, x, hw: int, init: bool, w=None, ld_pre=None):
        """ActNorm -> InvConv -> AdditiveCoupling (nf_code.py:331-360).
        Returns (y, logdet, actnorm_stats_or_None).

        ``w`` / ``ld_pre``: the PLU weight and the flow's (actnorm+invconv)
        logdet, precomputed BATCHED over K outside the scan (_block_fwd) —
        in-scan per-flow assembly serialises K tiny (c,c) matmuls and
        reductions, pure launch latency on TPU. In init mode both are
        recomputed here from the data-dependent stats."""
        if init:
            mean = jnp.mean(x, axis=(0, 1, 2))
            std = jnp.std(x, axis=(0, 1, 2), ddof=1)
            b, s = -mean, 1.0 / (std + 1e-6)
            stats = {"b": b, "s": s}
        else:
            b, s = p["actnorm"]["b"], p["actnorm"]["s"]
            stats = {"b": b, "s": s}
        y = s * (x + b)
        if w is None:
            w = self._plu_weight(p["invconv"])
        y = jnp.einsum("bhwi,oi->bhwo", y, w)
        if ld_pre is None or init:
            logdet = hw * (jnp.sum(jnp.log(jnp.abs(s)))
                           + jnp.sum(p["invconv"]["log_s"]))
        else:
            logdet = ld_pre

        ya, yb = jnp.split(y, 2, axis=-1)
        out_b = yb + self._coupling_nn(p["coupling"], ya)
        return jnp.concatenate([ya, out_b], axis=-1), logdet, stats

    # Finite guard for the reverse pass: half-trained flows amplify
    # off-manifold samples through the 128-flow inverse chain; magnitudes
    # overflow f32 (the reference's f32 math infs identically —
    # nf_code.py:613-621 mid-training grids go NaN). Guarding each flow's
    # output at 1e6 is an exact no-op for any sane activation (trained
    # activations are O(10)) while leaving ~32 decades of headroom so no
    # single flow can overflow from a guarded input; nan_to_num catches
    # pathologies born inside a flow (e.g. exp of a wild prior log_sd).
    # Result: mid-training sample grids are garbage-but-finite, like f64.
    REV_GUARD = 1e6

    def _rev_guard(self, x):
        g = self.REV_GUARD
        return jnp.clip(jnp.nan_to_num(x, nan=0.0, posinf=g, neginf=-g),
                        -g, g)

    def _flow_rev(self, p, y):
        ya, yb = jnp.split(y, 2, axis=-1)
        in_b = yb - self._coupling_nn(p["coupling"], ya)
        y = jnp.concatenate([ya, in_b], axis=-1)
        y = self._plu_solve(p["invconv"], y)
        y = y / p["actnorm"]["s"] - p["actnorm"]["b"]
        return self._rev_guard(y)

    @staticmethod
    def _plu_solve(p, y):
        """x = W^{-1} y for W = P L U, via exact permutation + two
        triangular solves instead of the reference's explicit
        ``torch.linalg.inv`` (nf_code.py:186). Forming W^{-1} in f32
        squares W's condition number; the solves keep half-trained flows
        finite at f32 (BASELINE.md Glow numerics note)."""
        c = p["L"].shape[0]
        dt = p["L"].dtype                          # f32, or f64 under x64
        eye = jnp.eye(c, dtype=dt)
        P = jax.lax.stop_gradient(p["P"]).astype(dt)
        s_sign = jax.lax.stop_gradient(p["s_sign"]).astype(dt)
        L = p["L"] * jnp.tril(jnp.ones((c, c), dt), -1) + eye
        U = (p["U"] * jnp.triu(jnp.ones((c, c), dt), 1)
             + jnp.diag(s_sign * jnp.exp(p["log_s"])))
        b, h, w, _ = y.shape
        yf = y.reshape(-1, c).T.astype(dt)         # (c, N) per-pixel vectors
        # P is a permutation: P^T y is an exact gather (HIGHEST precision so
        # the MXU does not bf16-truncate the values being permuted)
        t = jnp.matmul(P.T, yf, precision=jax.lax.Precision.HIGHEST)
        t = jax.scipy.linalg.solve_triangular(L, t, lower=True,
                                              unit_diagonal=True)
        t = jax.scipy.linalg.solve_triangular(U, t, lower=False)
        return t.T.reshape(b, h, w, c)

    # -- block --------------------------------------------------------------
    def _squeeze(self, x):
        return squeeze2d(x) if self.cfg.variant == "image" \
            else squeeze_time(x)

    def _unsqueeze(self, x):
        return unsqueeze2d(x) if self.cfg.variant == "image" \
            else unsqueeze_time(x)

    def _block_fwd(self, p, x, split: bool, init: bool):
        bsz = x.shape[0]
        y = self._squeeze(x)
        hw = y.shape[1] * y.shape[2]

        # Batched precompute of the K PLU weights + per-flow logdets: one
        # vmapped (K,c,c) assembly / one (K,) reduction instead of K tiny
        # serialised ops inside the scan body (launch-latency floor).
        w_all = jax.vmap(self._plu_weight)(p["flows"]["invconv"])
        ld_all = hw * (
            jnp.sum(jnp.log(jnp.abs(p["flows"]["actnorm"]["s"])), axis=1)
            + jnp.sum(p["flows"]["invconv"]["log_s"], axis=1))

        if self.pp_mesh is not None and not init:
            from vgd_tpu.parallel.pipeline_parallel import pp_flow_stack
            y, _ = pp_flow_stack(self.pp_mesh, self, p["flows"],
                                 y.astype(F32), self.pp_microbatches)
            logdet = jnp.sum(ld_all)
            stats = {"b": p["flows"]["actnorm"]["b"],
                     "s": p["flows"]["actnorm"]["s"]}
            return self._block_tail(p, y, logdet, stats, bsz, split)

        if self._use_flow_stack(hw) and not init:
            from vgd_tpu.ops.glow_flow_stack import glow_flow_stack
            (ph, _), (pw, _) = self.cfg.pad
            y = glow_flow_stack(
                p["flows"], w_all.swapaxes(1, 2), y, self.cfg.kernel,
                (ph, pw), compute_dtype=self.cfg.compute_dtype,
                interpret=jax.default_backend() != "tpu")
            logdet = jnp.sum(ld_all)
            # stacked per-flow actnorm params, same pytree as the scan's ys
            stats = {"b": p["flows"]["actnorm"]["b"],
                     "s": p["flows"]["actnorm"]["s"]}
            return self._block_tail(p, y, logdet, stats, bsz, split)

        def body(carry, xs):
            flow_p, w, ld_pre = xs
            y, logdet = carry
            y, ld, stats = self._flow_fwd(flow_p, y, hw, init, w=w,
                                          ld_pre=ld_pre)
            return (y, logdet + ld), stats

        if self.remat:
            body = jax.checkpoint(body)
        (y, logdet), stats = jax.lax.scan(body, (y, jnp.zeros((), y.dtype)),
                                          (p["flows"], w_all, ld_all),
                                          unroll=self.scan_unroll)
        return self._block_tail(p, y, logdet, stats, bsz, split)

    def _block_tail(self, p, y, logdet, stats, bsz, split: bool):
        """Split + prior log-prob, shared by the scan and flow-stack paths."""
        if split:
            y, z_new = jnp.split(y, 2, axis=-1)
            mean, log_sd = jnp.split(self._zeroconv(p["prior"], y), 2,
                                     axis=-1)
            log_p = gaussian_log_p(z_new, mean, log_sd)
        else:
            zero = jnp.zeros_like(y)
            mean, log_sd = jnp.split(self._zeroconv(p["prior"], zero), 2,
                                     axis=-1)
            log_p = gaussian_log_p(y, mean, log_sd)
            z_new = y
        log_p = jnp.sum(log_p.reshape(bsz, -1), axis=1)
        return y, logdet, log_p, z_new, stats

    def _block_rev(self, p, y, eps, split: bool, reconstruct: bool):
        if reconstruct:
            x = jnp.concatenate([y, eps], axis=-1) if split else eps
        else:
            if split:
                mean, log_sd = jnp.split(self._zeroconv(p["prior"], y), 2,
                                         axis=-1)
                z = gaussian_sample(eps, mean, log_sd)
                x = jnp.concatenate([y, z], axis=-1)
            else:
                zero = jnp.zeros_like(y)
                mean, log_sd = jnp.split(self._zeroconv(p["prior"], zero), 2,
                                         axis=-1)
                x = gaussian_sample(eps, mean, log_sd)

        def body(carry, flow_p):
            return self._flow_rev(flow_p, carry), None

        x, _ = jax.lax.scan(body, self._rev_guard(x), p["flows"],
                            reverse=True, unroll=self.scan_unroll)
        return self._unsqueeze(x)

    # -- model --------------------------------------------------------------
    def forward(self, params: Dict, x: jax.Array, init: bool = False):
        """Returns (log_p_sum, logdet, z_outs[, actnorm_stats if init])."""
        log_p_sum = jnp.zeros((x.shape[0],), x.dtype)
        logdet = jnp.zeros((), x.dtype)
        z_outs, all_stats = [], {}
        for i in range(self.cfg.n_blocks):
            p = params[f"block{i}"]
            x, ld, lp, z_new, stats = self._block_fwd(
                p, x, split=(i < self.cfg.n_blocks - 1), init=init)
            z_outs.append(z_new)
            logdet = logdet + ld
            log_p_sum = log_p_sum + lp
            all_stats[f"block{i}"] = stats
        if init:
            return log_p_sum, logdet, z_outs, all_stats
        return log_p_sum, logdet, z_outs

    def init_actnorm(self, params: Dict, x: jax.Array) -> Dict:
        """Data-dependent ActNorm init (nf_code.py:589-594): one forward in
        init mode, splice the emitted stacked stats into the params."""
        _, _, _, stats = self.forward(params, x, init=True)
        new = {}
        for bname, bp in params.items():
            flows = dict(bp["flows"])
            flows["actnorm"] = stats[bname]
            new[bname] = {"flows": flows, "prior": bp["prior"]}
        return new

    def reverse(self, params: Dict, z_list: Sequence[jax.Array],
                reconstruct: bool = False) -> jax.Array:
        x = None
        n = self.cfg.n_blocks
        for i in range(n - 1, -1, -1):
            p = params[f"block{i}"]
            split = i < n - 1
            if i == n - 1:
                x = self._block_rev(p, z_list[-1], z_list[-1], split,
                                    reconstruct)
            else:
                x = self._block_rev(p, x, z_list[i], split, reconstruct)
        return x


# ---------------------------------------------------------------------------
# Shapes + loss (nf_code.py:510-538)
# ---------------------------------------------------------------------------

def calc_z_shapes(n_channel: int, input_size: int, n_block: int
                  ) -> List[Tuple[int, int, int]]:
    """Latent shapes (H, W, C), image variant (nf_code.py:510-522, NHWC)."""
    shapes = []
    size, ch = input_size, n_channel
    for _ in range(n_block - 1):
        size //= 2
        ch *= 2
        shapes.append((size, size, ch))
    size //= 2
    shapes.append((size, size, ch * 4))
    return shapes


def calc_z_shapes_eeg(num_chans: int, num_samples: int, n_block: int
                      ) -> List[Tuple[int, int, int]]:
    """Latent shapes (T, 1, C), EEG variant (flow_eeg.py:360-363)."""
    shapes = []
    t = num_samples
    for _ in range(n_block - 1):
        t //= 2
        shapes.append((t, 1, num_chans))
    t //= 2
    shapes.append((t, 1, num_chans * 2))
    return shapes


def calc_loss(log_p: jax.Array, logdet: jax.Array, image_size: int,
              n_bins: float, n_channels: int = 3):
    """Bits/dim objective (nf_code.py:528-538). The EEG trainer reuses this
    formula with image_size=T and n_bins=1 (flow_eeg.py:392); preserved."""
    n_pixel = image_size * image_size * n_channels
    loss = -math.log(n_bins) * n_pixel + logdet + log_p
    scale = math.log(2) * n_pixel
    return (jnp.mean(-loss / scale), jnp.mean(log_p / scale),
            jnp.mean(logdet / scale))
