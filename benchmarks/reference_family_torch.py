"""Measure the REFERENCE's torch-CPU throughput for the remaining families.

Independent torch implementations of the reference's DCGAN
(gan_code.py:193-217, batch 128), WGAN (gan_code.py:298-330: 5 critic
iterations, mean-score loss, weight clip +-0.01, batch 64) and denoising
VAE (main_vae.py:96-135: per-batch U(0,1)*0.5 noise std, clamp, joint
Adam(1e-3), MSE + 1e-5*warmup*KL) training steps at 64x64, reusing the
model builders from reference_baseline_torch.py. CPU, like the measured
VAE-GAN baseline (the reference's GPU was not available; BASELINE.md).

Run:  python benchmarks/reference_family_torch.py [--steps N]
"""
from __future__ import annotations

import argparse
import json
import time

import torch
import torch.nn as nn

from reference_baseline_torch import (Encoder, build_discriminator,
                                      build_generator)


def timeit(step, steps):
    step()  # warmup
    t0 = time.time()
    for _ in range(steps):
        step()
    return time.time() - t0


def bench_dcgan(steps, batch=128, img=64):
    torch.manual_seed(42)
    gen = build_generator(img=img)
    dis = build_discriminator(img=img)
    opt_g = torch.optim.Adam(gen.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(dis.parameters(), lr=2e-4, betas=(0.5, 0.999))
    bce = nn.BCELoss()
    x = torch.rand(batch, 3, img, img) * 2 - 1
    ones = torch.ones(batch)
    zeros = torch.zeros(batch)

    def step():
        fake = gen(torch.randn(batch, 100, 1, 1))
        d_loss = bce(dis(x).view(-1), ones) + \
            bce(dis(fake.detach()).view(-1), zeros)
        opt_d.zero_grad(); d_loss.backward(); opt_d.step()
        g_loss = bce(dis(fake).view(-1), ones)
        opt_g.zero_grad(); g_loss.backward(); opt_g.step()

    dt = timeit(step, steps)
    return steps * batch / dt


def bench_wgan(steps, batch=64, img=64, critic_iters=5):
    torch.manual_seed(42)
    gen = build_generator(img=img)
    dis = build_discriminator(img=img)
    opt_g = torch.optim.Adam(gen.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(dis.parameters(), lr=2e-4, betas=(0.5, 0.999))
    x = torch.rand(batch, 3, img, img) * 2 - 1

    def step():
        for _ in range(critic_iters):
            fake = gen(torch.randn(batch, 100, 1, 1))
            d_loss = dis(fake.detach()).mean() - dis(x).mean()
            opt_d.zero_grad(); d_loss.backward(); opt_d.step()
            with torch.no_grad():
                for p in dis.parameters():
                    p.clamp_(-0.01, 0.01)
        fake = gen(torch.randn(batch, 100, 1, 1))
        g_loss = -dis(fake).mean()
        opt_g.zero_grad(); g_loss.backward(); opt_g.step()

    dt = timeit(step, steps)
    return steps * batch / dt


def bench_vae(steps, batch=64, img=64):
    torch.manual_seed(42)
    enc = Encoder()
    dec = build_generator(img=img)
    opt = torch.optim.Adam(list(enc.parameters()) + list(dec.parameters()),
                           lr=1e-3)
    mse = nn.MSELoss()
    x = torch.rand(batch, 3, img, img) * 2 - 1

    def step():
        std = torch.rand(1).item() * 0.5
        noisy = torch.clamp(x + std * torch.randn_like(x), -1, 1)
        mu, logvar = enc(noisy)
        logvar = torch.clamp(logvar, -10, 10)
        z = mu + torch.exp(0.5 * logvar) * torch.randn_like(mu)
        recon = dec(z.unsqueeze(-1).unsqueeze(-1))
        kl = -0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp()) / batch
        loss = mse(recon, x) + 1e-5 * 0.5 * kl
        opt.zero_grad(); loss.backward(); opt.step()

    dt = timeit(step, steps)
    return steps * batch / dt


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    a = ap.parse_args()
    out = {
        "dcgan_b128_img_per_sec": round(bench_dcgan(a.steps), 2),
        "wgan_b64_img_per_sec": round(bench_wgan(a.steps), 2),
        "vae_b64_img_per_sec": round(bench_vae(a.steps), 2),
        "device": "cpu", "torch": torch.__version__,
    }
    print(json.dumps(out))
