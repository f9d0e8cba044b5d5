"""Analytic FLOP/byte accounting for the Glow train step.

Why: the roofline row for Glow (benchmarks/roofline.py) reports achieved
HBM bandwidth, which paints Glow as "24% of the roof" — but Glow's hot
loop is NOT bandwidth-limited once batch saturates: the K=32-per-block
coupling networks put ~97% of their FLOPs into f=512 matmuls whose
achievable MXU efficiency is capped by skinny contraction/output dims
(conv1 contracts over 9*c/2 = 54; zeroconv emits c/2 = 6..48 columns).
This script derives the exact per-step FLOPs and activation bytes from the
model config and combines them with measured img/s (BASELINE.md) to show
where each batch size sits: latency-bound at the reference's b16,
MXU-shape-bound (~40% of bf16 peak) at saturation. Matches the hot loop of
/root/reference/nf_code.py:577 (train) at its 711-722 config.

Run:  python benchmarks/glow_flops.py [--batch 16 64 256] [--ips 497 703 684]
(no jax import — pure arithmetic, safe to run alongside TPU jobs)
"""
from __future__ import annotations

import argparse
import json

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def glow_step_cost(batch: int, img: int = 64, K: int = 32, L: int = 4,
                   f: int = 512, in_ch: int = 3, bwd_mult: float = 3.0):
    """Per-train-step FLOPs and activation HBM bytes, block by block."""
    blocks = []
    h = w = img
    c = in_ch
    tot_flops = 0.0
    tot_mxu_eff_flops = 0.0  # FLOPs weighted by the shape-capped MXU ceiling
    tot_bytes = 0.0
    for li in range(L):
        h, w, c = h // 2, w // 2, c * 4
        n = batch * h * w
        ch = c // 2
        kc = 9 * ch                      # conv1 contraction (3x3, ch in)
        # per-flow matmul FLOPs (fwd)
        f_conv1 = 2.0 * n * kc * f
        f_conv2 = 2.0 * n * f * f
        f_zero = 2.0 * n * f * ch        # 3x3 zeroconv as shift-sum matmul
        f_inv = 2.0 * n * c * c          # 1x1 PLU
        flow = f_conv1 + f_conv2 + f_zero + f_inv
        # MXU ceiling per matmul: dims pad to the 128x128 systolic array;
        # a dim d contributes min(d,128)/128 utilisation on that axis.
        def eff(m_rows, kdim, ncols):
            return (min(kdim, 128) / 128.0) * (min(ncols, 128) / 128.0)
        e = (f_conv1 * eff(n, kc, f) + f_conv2 * eff(n, f, f)
             + f_zero * eff(n, f, ch) + f_inv * eff(n, c, c))
        # activation bytes per flow (bf16 couplings): x RW + the f-wide
        # internals h1/h2 W+R each + zeroconv read
        bytes_flow = 2.0 * (2 * n * c + 4 * n * f + n * ch)
        nflows = K
        tot_flops += flow * nflows
        tot_mxu_eff_flops += e * nflows
        tot_bytes += bytes_flow * nflows
        blocks.append({
            "block": li, "hw": h * w, "c": c,
            "gflops_fwd": round(flow * nflows / 1e9, 1),
            "mxu_ceiling": round(e / flow, 3),
        })
        if li != L - 1:
            c = c // 2                   # split drops half the channels
    return {
        "flops_step": tot_flops * bwd_mult,
        "mxu_ceiling_weighted": tot_mxu_eff_flops / tot_flops,
        "bytes_step": tot_bytes * bwd_mult,
        "blocks": blocks,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="*", default=[16, 64, 256])
    ap.add_argument("--ips", type=float, nargs="*",
                    default=[497.0, 703.0, 684.0],
                    help="measured img/s for each batch (BASELINE.md)")
    a = ap.parse_args()
    rows = []
    for b, ips in zip(a.batch, a.ips):
        c = glow_step_cost(b)
        step_s = b / ips
        tflops = c["flops_step"] / step_s / 1e12
        gbs = c["bytes_step"] / step_s / 1e9
        rows.append({
            "batch": b, "img_per_s": ips,
            "step_ms": round(step_s * 1000, 1),
            "achieved_tflops": round(tflops, 1),
            "pct_bf16_peak": round(100 * tflops / V5E_BF16_TFLOPS, 1),
            "pct_mxu_shape_ceiling": round(
                100 * tflops / (V5E_BF16_TFLOPS
                                * c["mxu_ceiling_weighted"]), 1),
            "achieved_act_gbs": round(gbs, 1),
            "pct_hbm_peak": round(100 * gbs / V5E_HBM_GBS, 1),
        })
    print(json.dumps({
        "mxu_shape_ceiling_weighted": round(
            glow_step_cost(16)["mxu_ceiling_weighted"], 3),
        "per_block": glow_step_cost(16)["blocks"],
        "measured": rows,
    }, indent=1))


if __name__ == "__main__":
    main()
