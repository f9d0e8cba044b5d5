"""Measure the REFERENCE's training throughput (torch, CPU) for BASELINE.md.

The reference publishes no numbers (SURVEY.md §6), so the baseline is
measured: an independent torch implementation of the reference VAE-GAN
training step at the BASELINE.json config-1 scale (CelebA 64x64, batch 64,
encoder/decoder/discriminator of vaegan_code.py semantics: 2 D-steps with
label smoothing + instance noise, then the G/E step with pixel MSE + warmup
KL + adversarial BCE, three Adam(2e-4) optimizers), plus prior sampling.

Run:  python benchmarks/reference_baseline_torch.py [--steps N]
Prints a JSON line with images/sec; record the value in BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import time

import torch
import torch.nn as nn


def build_generator(nz=100, ngf=64, img=64):
    ch = [ngf * 16]
    s = 4
    while s < img:
        ch.append(max(ch[-1] // 2, 3))
        s *= 2
    layers = [nn.ConvTranspose2d(nz, ch[0], 4, 1, 0, bias=False),
              nn.BatchNorm2d(ch[0]), nn.ReLU(True)]
    for i in range(1, len(ch)):
        layers += [nn.ConvTranspose2d(ch[i - 1], ch[i], 4, 2, 1, bias=False),
                   nn.BatchNorm2d(ch[i]), nn.ReLU(True)]
    layers += [nn.Conv2d(ch[-1], 3, 3, 1, 1, bias=False), nn.Tanh()]
    return nn.Sequential(*layers)


def build_discriminator(ndf=64, img=64):
    ch = [ndf // 4]
    s = img // 2
    while s > 4:
        ch.append(ch[-1] * 2)
        s //= 2
    layers = [nn.Conv2d(3, ch[0], 4, 2, 1, bias=False),
              nn.LeakyReLU(0.2, True)]
    for i in range(1, len(ch)):
        layers += [nn.Conv2d(ch[i - 1], ch[i], 4, 2, 1, bias=False),
                   nn.BatchNorm2d(ch[i]), nn.LeakyReLU(0.2, True)]
    layers += [nn.Conv2d(ch[-1], 1, 4, 1, 0, bias=False), nn.Sigmoid()]
    return nn.Sequential(*layers)


class Encoder(nn.Module):
    def __init__(self, latent=100):
        super().__init__()
        chans = [3, 32, 64, 128, 256]
        seq = []
        for i in range(1, len(chans)):
            seq += [nn.Conv2d(chans[i - 1], chans[i], 4, 2),
                    nn.BatchNorm2d(chans[i]), nn.LeakyReLU(inplace=True)]
        self.cnn = nn.Sequential(*seq)
        with torch.no_grad():
            flat = self.cnn(torch.zeros(1, 3, 64, 64)).flatten(1).shape[1]
        self.fc_mu = nn.Linear(flat, latent)
        self.fc_logvar = nn.Linear(flat, latent)

    def forward(self, x):
        h = self.cnn(x).flatten(1)
        return self.fc_mu(h), self.fc_logvar(h)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--img", type=int, default=64)
    args = ap.parse_args()

    torch.manual_seed(42)
    enc = Encoder()
    dec = build_generator(img=args.img)
    dis = build_discriminator(img=args.img)
    opt_e = torch.optim.Adam(enc.parameters(), lr=2e-4)
    opt_d = torch.optim.Adam(dec.parameters(), lr=2e-4)
    opt_dis = torch.optim.Adam(dis.parameters(), lr=2e-4)
    bce = nn.BCELoss()
    mse = nn.MSELoss()

    x = torch.rand(args.batch, 3, args.img, args.img) * 2 - 1
    real_labels = torch.full((args.batch,), 0.9)
    fake_labels = torch.full((args.batch,), 0.1)

    def step(epoch=10):
        mu, logvar = enc(x)
        logvar = torch.clamp(logvar, -10, 10)
        z = mu + torch.exp(0.5 * logvar) * torch.randn_like(mu)
        recon = dec(z.unsqueeze(-1).unsqueeze(-1))
        xn = x + 0.05 * torch.randn_like(x)
        rn = recon + 0.05 * torch.randn_like(recon)
        for _ in range(2):
            d_loss = bce(dis(xn).view(-1), real_labels) + \
                bce(dis(rn.detach()).view(-1), fake_labels)
            opt_dis.zero_grad()
            d_loss.backward()
            opt_dis.step()
        out = dis(rn).view(-1)
        kl = -0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp()) \
            / args.batch
        loss = mse(recon, x) + 0.1 * min(1.0, epoch / 50) * kl + \
            0.1 * bce(out, real_labels)
        opt_e.zero_grad()
        opt_d.zero_grad()
        loss.backward()
        opt_e.step()
        opt_d.step()

    step()  # warmup
    t0 = time.time()
    for _ in range(args.steps):
        step()
    dt = time.time() - t0
    ips = args.steps * args.batch / dt

    # prior sampling throughput (BASELINE.json config 1 second half)
    with torch.no_grad():
        z = torch.randn(args.batch, 100, 1, 1)
        dec(z)  # warmup
        t0 = time.time()
        for _ in range(args.steps):
            dec(torch.randn(args.batch, 100, 1, 1))
        sample_ips = args.steps * args.batch / (time.time() - t0)

    print(json.dumps({
        "metric": "reference torch CPU VAE-GAN train images/sec",
        "train_images_per_sec": round(ips, 2),
        "sample_images_per_sec": round(sample_ips, 2),
        "batch": args.batch, "img": args.img, "steps": args.steps,
        "device": "cpu", "torch": torch.__version__,
    }))


if __name__ == "__main__":
    main()
