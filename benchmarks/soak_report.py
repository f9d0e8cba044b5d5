"""Summarise the round-4 soak artifacts into markdown tables.

Reads the runs/soak_* directories produced by benchmarks/soak_round4.sh and
prints a BASELINE.md-ready report:
  * flagship: per-epoch curve summary (loss / SSIM / PSNR / IS / FID at
    selected epochs), epoch wall-clock incl. eval, kill/resume gap check
    (every epoch 0..N-1 present exactly once, post-resume continuity);
  * DDPM: train/val loss trajectory + restoration eval metrics;
  * DCGAN: loss trajectory + checkpoint-sweep metrics curve;
  * TSTR: per-subject accuracy/F1/kappa table across the four regimes.

Pure numpy/json — safe to run while a TPU job holds the chip.
"""
from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs"


def rows(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def fmt(v, nd=4):
    return f"{v:.{nd}f}" if isinstance(v, (int, float)) else str(v)


def flagship():
    path = os.path.join(OUT, "soak_vaegan", "loss.jsonl")
    rs = rows(path)
    if not rs:
        print("(flagship: no rows yet)")
        return
    epochs = [int(r["epoch"]) for r in rs]
    uniq = sorted(set(epochs))
    dup = len(epochs) - len(uniq)
    total = max(uniq) + 1
    missing = [e for e in range(total) if e not in set(uniq)]
    print(f"### Flagship 150-epoch soak — {len(rs)} rows, "
          f"epochs 0..{max(uniq)}, {dup} duplicate rows (kill overlap), "
          f"missing: {missing or 'none'}")
    # continuity across the kill: the jsonl from both legs, last row wins
    by_epoch = {int(r["epoch"]): r for r in rs}
    picks = [e for e in (0, 9, 24, 49, 74, 99, 124, 149) if e in by_epoch]
    # *_surrogate columns = random-init Inception weights (egress-blocked):
    # FID/P/R/F1 are relative-trend-only two-sample stats, IS is dropped
    cols = ["epoch", "train_recon", "train_kl", "train_adv", "val_loss",
            "ssim", "psnr", "inception_score", "fid", "fid_surrogate",
            "precision", "precision_surrogate", "recall",
            "recall_surrogate", "f1", "f1_surrogate",
            "images_per_sec", "val_secs"]
    have = [c for c in cols if any(c in by_epoch[e] for e in picks)]
    print("| " + " | ".join(have) + " |")
    print("|" + "---|" * len(have))
    for e in picks:
        r = by_epoch[e]
        print("| " + " | ".join(
            str(e) if c == "epoch" else
            fmt(r.get(c, ""), 2 if c in ("psnr", "fid", "fid_surrogate",
                                         "images_per_sec", "val_secs") else 4)
            for c in have) + " |")
    ips = [r["images_per_sec"] for r in rs[1:]]
    vs = [r.get("val_secs", 0) for r in rs[1:]]
    if ips:
        print(f"\nwall-clock img/s (train phase, excl. epoch 0): "
              f"median {np.median(ips):.0f}, p10 {np.percentile(ips,10):.0f},"
              f" p90 {np.percentile(ips,90):.0f}; "
              f"val+metrics phase median {np.median(vs):.1f}s/epoch")


def ddpm(dirname="soak_ddpm", label="DDPM"):
    rs = rows(os.path.join(OUT, dirname, "diffusion_loss.jsonl"))
    if not rs:
        print(f"({dirname}: no rows yet)")
        return
    print(f"### {label} {len(rs)}-epoch soak")
    print("| epoch | train_loss | val_loss | img/s |")
    print("|---|---|---|---|")
    for r in rs[:: max(1, len(rs) // 8)] + ([rs[-1]] if rs else []):
        print(f"| {r['epoch']} | {fmt(r['train_loss'])} | "
              f"{fmt(r['val_loss'])} | {r['images_per_sec']:.0f} |")
    p = os.path.join(OUT, dirname, "diffusion_eval_metrics.npz")
    if os.path.exists(p):
        d = dict(np.load(p))
        print("restoration eval: " +
              " ".join(f"{k}={float(v):.4f}" for k, v in d.items()))


def glow():
    rs = rows(os.path.join(OUT, "soak_glow", "glow_loss.jsonl"))
    if not rs:
        print("(glow: no rows yet)")
        return
    print(f"### Glow production-CLI run ({rs[-1]['iter']} iters, "
          "reference shape 64px K=32 L=4 5-bit)")
    print("| iter | bits/dim loss | img/s |")
    print("|---|---|---|")
    for r in rs[:: max(1, len(rs) // 8)] + [rs[-1]]:
        print(f"| {r['iter']} | {fmt(r['loss'])} | "
              f"{r['images_per_sec']:.0f} |")
    p = os.path.join(OUT, "soak_glow", "glow_eval_metrics.npz")
    if os.path.exists(p):
        d = dict(np.load(p))
        print("generation eval: " + " ".join(
            f"{k}={float(v):.4f}" for k, v in d.items()
            if np.ndim(v) == 0))


def wgan():
    rs = rows(os.path.join(OUT, "soak_wgan", "gan_loss.jsonl"))
    if not rs:
        print("(wgan: no rows yet)")
        return
    print(f"### WGAN {len(rs)}-epoch soak (5 critic iters, clip ±0.01)")
    print("| epoch | d_loss | g_loss | img/s |")
    print("|---|---|---|---|")
    for r in rs[:: max(1, len(rs) // 8)] + [rs[-1]]:
        print(f"| {r['epoch']} | {fmt(r['d_loss'])} | {fmt(r['g_loss'])} | "
              f"{r['images_per_sec']:.0f} |")
    p = os.path.join(OUT, "soak_wgan", "metrics.npz")
    if os.path.exists(p):
        d = np.load(p, allow_pickle=True)
        arr = d["results"]
        cols = ([str(c) for c in d["columns"]]
                if "columns" in d else ["(untagged)"])
        print(f"checkpoint sweep ({arr.shape[0]} ckpts): | "
              + " | ".join(cols) + " |")
        for i in (0, arr.shape[0] // 2, arr.shape[0] - 1):
            print("  | " + " | ".join(fmt(x) for x in arr[i]) + " |")


def dcgan():
    rs = rows(os.path.join(OUT, "soak_gan", "gan_loss.jsonl"))
    if not rs:
        print("(dcgan: no rows yet)")
        return
    print(f"### DCGAN {len(rs)}-epoch soak")
    print("| epoch | d_loss | g_loss | img/s |")
    print("|---|---|---|---|")
    for r in rs[:: max(1, len(rs) // 8)] + ([rs[-1]] if rs else []):
        print(f"| {r['epoch']} | {fmt(r['d_loss'])} | {fmt(r['g_loss'])} | "
              f"{r['images_per_sec']:.0f} |")
    p = os.path.join(OUT, "soak_gan", "metrics.npz")
    if os.path.exists(p):
        d = np.load(p)
        arr = d["results"]
        print(f"checkpoint sweep: {arr.shape[0]} checkpoints scored "
              f"(metrics.npz columns: step + MetricAccumulator outputs)")
        for i in (0, arr.shape[0] // 2, arr.shape[0] - 1):
            print("  " + " ".join(fmt(x) for x in arr[i]))


def vae():
    rs = rows(os.path.join(OUT, "soak_vae", "vae_loss.jsonl"))
    if not rs:
        print("(vae: no rows yet)")
        return
    print(f"### Denoising-VAE {len(rs)}-epoch soak")
    print("| epoch | train_loss | val_loss | img/s |")
    print("|---|---|---|---|")
    for r in rs[:: max(1, len(rs) // 8)] + ([rs[-1]] if rs else []):
        print(f"| {r['epoch']} | {fmt(r.get('train_loss', r.get('loss')))} | "
              f"{fmt(r.get('val_loss'))} | {r['images_per_sec']:.0f} |")
    p = os.path.join(OUT, "soak_vae", "vae_eval_metrics.npz")
    if os.path.exists(p):
        d = np.load(p, allow_pickle=True)
        arr, cols = d["results"], [str(c) for c in d["columns"]]
        print(f"aggregated-posterior checkpoint sweep "
              f"({arr.shape[0]} ckpts): | " + " | ".join(cols) + " |")
        for i in (0, arr.shape[0] // 2, arr.shape[0] - 1):
            print("  | " + " | ".join(fmt(x) for x in arr[i]) + " |")
    p = os.path.join(OUT, "soak_vae", "occlusion_metrics.npz")
    if os.path.exists(p):
        d = dict(np.load(p))
        print("occlusion eval: " +
              " ".join(f"{k}={float(v):.4f}" for k, v in d.items()))


def flagship256():
    rs = rows(os.path.join(OUT, "soak_vaegan256", "loss.jsonl"))
    if not rs:
        print("(vaegan-256: no rows yet)")
        return
    print(f"### Flagship VAE-GAN at the reference's FULL scale "
          f"(256x256, batch 64) — {len(rs)} epochs, production loop")
    cols = ["epoch", "train_recon", "train_kl", "train_adv", "val_loss",
            "ssim", "psnr", "fid_surrogate", "images_per_sec", "val_secs"]
    have = [c for c in cols if any(c in r for r in rs)]
    print("| " + " | ".join(have) + " |")
    print("|" + "---|" * len(have))
    for r in rs:
        print("| " + " | ".join(
            fmt(r.get(c, ""), 2 if c in ("psnr", "fid_surrogate",
                                         "images_per_sec", "val_secs")
                else 4) for c in have) + " |")


def epoch_scan_ab():
    out = {}
    for fam in ("gan", "vae"):
        r = {}
        for mode in ("step", "scan"):
            p = os.path.join(OUT, f"ab_{fam}_{mode}", f"{fam}_loss.jsonl")
            rs = rows(p)
            ips = [x["images_per_sec"] for x in rs[1:]]
            if ips:
                r[mode] = sum(ips) / len(ips)
        if len(r) == 2:
            out[fam] = {"step": round(r["step"]), "scan": round(r["scan"]),
                        "scan_over_step": round(r["scan"] / r["step"], 3)}
    if out:
        print("### Epoch-scan A/B (quarter-epoch chunking fix, 3 epochs, "
              "first excluded)")
        print("| family | per-step img/s | scan img/s | scan/step |")
        print("|---|---|---|---|")
        for fam, d in out.items():
            print(f"| {fam} | {d['step']} | {d['scan']} | "
                  f"{d['scan_over_step']} |")
    else:
        print("(epoch-scan A/B: no rows yet)")


def tstr():
    print("### EEG TSTR (synthetic-ERD dataset, subjects 01/02)")
    hdr = False
    for method in ("real", "sr", "other_sub", "synt"):
        # round-5 four-regime table (overlap data) lives in soak_eeg2;
        # fall back to the round-4 location
        p = os.path.join(OUT, "soak_eeg2", f"tstr_{method}.json.txt")
        if not os.path.exists(p):
            p = os.path.join(OUT, "soak_eeg", f"tstr_{method}.json.txt")
        if not os.path.exists(p):
            print(f"({method}: not yet)")
            continue
        txt = open(p).read().strip().splitlines()
        if not txt:
            continue
        try:
            res = json.loads(txt[-1])
        except json.JSONDecodeError:
            print(f"({method}: unparsable)")
            continue
        if not hdr:
            print("| method | subject | test acc | test F1 | test kappa |")
            print("|---|---|---|---|---|")
            hdr = True
        for subj, sc in res.items():
            t = sc["test"]
            print(f"| {method} | {subj} | {fmt(t.get('acc'))} | "
                  f"{fmt(t.get('f1'))} | {fmt(t.get('k'))} |")


if __name__ == "__main__":
    flagship()
    print()
    ddpm()
    print()
    ddpm("soak_ddpm256", "DDPM full-256px-scale")
    print()
    glow()
    print()
    wgan()
    print()
    dcgan()
    print()
    vae()
    print()
    flagship256()
    print()
    epoch_scan_ab()
    print()
    tstr()
