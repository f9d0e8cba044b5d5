"""End-to-end checkpoint parity: train the REFERENCE, import, compare.

BASELINE.json's north star demands "FID and PSNR parity against PyTorch
checkpoints". This harness produces that evidence with no external data or
weights:

1. trains the reference's own VAE-GAN in-process (its actual nn.Modules,
   gan_code.py:16-89 + main_vae.py:34-58, stepped with the exact
   vaegan_code.py:71-135 loop semantics under torch's own RNG) for a
   configurable number of steps at the reference's native 256px scale on a
   synthetic dataset;
2. saves the torch checkpoints exactly as the reference does
   (state_dict files);
3. imports them through vgd_tpu.io.torch_import;
4. runs the SAME held-out denoising evaluation (vaegan_code.py:150-167:
   0.05-std noise, clamp, encode->reparam->decode) through BOTH the torch
   model and the imported flax model on identical noisy inputs, and reports
   side-by-side PSNR / SSIM / MSE plus a surrogate FID (both recon sets
   scored against the clean val set with the same random-init InceptionV3
   features — real pt_inception weights slot in via --inception-weights
   when available, see eval/inception.py);
5. writes a markdown table to docs/PARITY.md ("Checkpoint-level parity"
   section) and a JSON blob next to it.

Run:  python benchmarks/reference_checkpoint_parity.py [--steps 40]
      [--val-size 32] [--batch 8] [--inception-weights pt_inception.pth]

CPU-only (torch has no TPU here); expect ~10 min at the default 40 steps
on a 1-vCPU box.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def train_reference(ref, faces_u8, batch, steps, seed=42):
    """The reference's own training loop (vaegan_code.py:55-135) on its own
    modules, torch RNG, at 256px. Returns (encoder, decoder, disc)."""
    import torch
    import torch.nn as tnn
    import torch.optim as toptim

    torch.manual_seed(seed)
    enc = ref.vae.Encoder((3, 256, 256), 100)
    dec = ref.gan.Generator(nz=100)
    dis = ref.gan.Discriminator()
    dec.apply(ref.gan.weights_init)
    dis.apply(ref.gan.weights_init)
    enc.train(), dec.train(), dis.train()
    opt_e = toptim.Adam(enc.parameters(), lr=2e-4)
    opt_d = toptim.Adam(dec.parameters(), lr=2e-4)
    opt_dis = toptim.Adam(dis.parameters(), lr=2e-4)
    bce, mse = tnn.BCELoss(), tnn.MSELoss()

    n = len(faces_u8)
    t0 = time.time()
    for i in range(steps):
        sel = np.arange(i * batch, (i + 1) * batch) % n
        x = torch.tensor(np.ascontiguousarray(
            faces_u8[sel].astype(np.float32).transpose(0, 3, 1, 2))
            / 127.5 - 1.0)
        mu, logvar = enc(x)
        logvar = torch.clamp(logvar, -10, 10)
        z = mu + torch.exp(0.5 * logvar) * torch.randn_like(mu)
        recon = dec(z.unsqueeze(-1).unsqueeze(-1))
        real_l = torch.full((batch,), 0.9)
        fake_l = torch.full((batch,), 0.1)
        real_noisy = x + 0.05 * torch.randn_like(x)
        recon_noisy = recon + 0.05 * torch.randn_like(recon)
        for _ in range(2):
            d_loss = (bce(dis(real_noisy), real_l)
                      + bce(dis(recon_noisy.detach()), fake_l))
            opt_dis.zero_grad()
            d_loss.backward()
            opt_dis.step()
        fake_out = dis(recon_noisy)
        recon_loss = mse(recon, x)
        kl = -0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp()) / batch
        total = recon_loss + 0.1 * min(1.0, (i // (n // batch)) / 50) * kl \
            + 0.1 * bce(fake_out, real_l)
        opt_e.zero_grad()
        opt_d.zero_grad()
        total.backward()
        opt_e.step()
        opt_d.step()
        if (i + 1) % 10 == 0:
            print(f"[ref-train] step {i + 1}/{steps} "
                  f"recon={recon_loss.item():.4f} d={d_loss.item():.4f} "
                  f"({(time.time() - t0) / (i + 1):.1f}s/step)")
    return enc, dec, dis


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--train-size", type=int, default=64)
    ap.add_argument("--val-size", type=int, default=32)
    ap.add_argument("--inception-weights", type=str, default=None)
    ap.add_argument("--out", type=str, default="docs/PARITY.md")
    a = ap.parse_args()

    import torch

    from vgd_tpu.data.celeba import synthetic_faces
    from vgd_tpu.io.reference_compat import import_reference

    ref = import_reference()
    faces = synthetic_faces(a.train_size, (256, 256), seed=5)
    val = synthetic_faces(a.val_size, (256, 256), seed=6)

    enc_t, dec_t, dis_t = train_reference(ref, faces, a.batch, a.steps)

    # save exactly as the reference does (state_dict files,
    # vaegan_code.py:193 / main_vae.py:204-205)
    td = tempfile.mkdtemp(prefix="refckpt_")
    enc_path = os.path.join(td, "vae_encoder.pth")
    dec_path = os.path.join(td, "vaegan_decoder.pth")
    torch.save(enc_t.state_dict(), enc_path)
    torch.save(dec_t.state_dict(), dec_path)

    # ---- import into vgd_tpu ------------------------------------------
    import jax
    import jax.numpy as jnp

    from vgd_tpu.eval.metrics import (MetricAccumulator, mse_metric, psnr,
                                      ssim)
    from vgd_tpu.io.torch_import import import_encoder, import_generator
    from vgd_tpu.models.vae import latent_to_spatial

    enc_v = jax.tree_util.tree_map(jnp.asarray, import_encoder(enc_path))
    dec_v = jax.tree_util.tree_map(jnp.asarray,
                                   import_generator(dec_path, n_up=6))
    from vgd_tpu.core.config import DataConfig, RunConfig, VAEGANConfig
    from vgd_tpu.train.vaegan import VAEGANTrainer
    trainer = VAEGANTrainer(
        VAEGANConfig(data=DataConfig(image_size=(256, 256), batch_size=8),
                     run=RunConfig(compute_dtype="float32")),
        (256, 256, 3))

    # ---- identical denoising eval through both sides ------------------
    rng = np.random.default_rng(0)
    clean = val.astype(np.float32) / 127.5 - 1.0           # NHWC
    noisy = np.clip(clean + 0.05 * rng.standard_normal(clean.shape)
                    .astype(np.float32), -1, 1)            # vaegan_code.py:153
    eps = rng.standard_normal((len(val), 100)).astype(np.float32)

    enc_t.eval(), dec_t.eval()
    with torch.no_grad():
        nt = torch.tensor(np.ascontiguousarray(noisy.transpose(0, 3, 1, 2)))
        mu, logvar = enc_t(nt)
        logvar = torch.clamp(logvar, -10, 10)
        z = mu + torch.exp(0.5 * logvar) * torch.tensor(eps)
        recon_t = dec_t(z.unsqueeze(-1).unsqueeze(-1)) \
            .permute(0, 2, 3, 1).numpy()

    @jax.jit
    def jax_denoise(noisy_, eps_):
        mu, logvar = trainer.encoder.apply(enc_v, noisy_, train=False)
        logvar = jnp.clip(logvar, -10, 10)
        z = mu + jnp.exp(0.5 * logvar) * eps_
        return trainer.decoder.apply(dec_v, latent_to_spatial(z),
                                     train=False)

    recon_j = np.asarray(jax_denoise(jnp.asarray(noisy), jnp.asarray(eps)))
    print(f"[parity] recon max|torch - jax| = "
          f"{np.abs(recon_t - recon_j).max():.2e}")

    feature_fn = None
    tag = "surrogate (random-init InceptionV3)"
    from vgd_tpu.eval.inception import load_inception
    feature_fn, loaded = load_inception(a.inception_weights, feature="64")
    if a.inception_weights:
        tag = f"true weights ({os.path.basename(a.inception_weights)})"

    rows = {}
    clean_unit = jnp.asarray((clean + 1) * 0.5)
    for name, recon in (("reference torch", recon_t),
                        ("vgd_tpu (imported)", recon_j)):
        ru = jnp.asarray(np.clip((recon + 1) * 0.5, 0, 1))
        acc = MetricAccumulator(feature_fn=feature_fn)
        acc.update(ru, clean_unit)
        m = acc.compute()
        rows[name] = {
            "psnr": float(psnr(ru, clean_unit)),
            "ssim": float(m["ssim"]),
            "mse": float(mse_metric(ru, clean_unit)),
            "fid64": float(m.get("fid", float("nan"))),
        }
        print(f"[parity] {name}: " +
              " ".join(f"{k}={v:.4f}" for k, v in rows[name].items()))

    blob = {"steps": a.steps, "batch": a.batch, "val_size": a.val_size,
            "recon_max_abs_diff": float(np.abs(recon_t - recon_j).max()),
            "inception": tag, "metrics": rows}
    with open("docs/PARITY_CHECKPOINT.json", "w") as f:
        json.dump(blob, f, indent=1)

    lines = [
        "",
        "## Checkpoint-level parity (measured; "
        "`benchmarks/reference_checkpoint_parity.py`)",
        "",
        f"The reference's own VAE-GAN (its actual classes, its own loop "
        f"semantics, torch RNG) trained for {a.steps} steps at 256px on "
        f"synthetic data; checkpoints saved as the reference saves them and "
        f"imported via `io/torch_import.py`; both sides then ran the "
        f"identical held-out denoising eval (vaegan_code.py:150-167) on "
        f"the same noisy inputs. FID features: {tag}.",
        "",
        "| side | PSNR | SSIM | MSE | FID-64 |",
        "|---|---|---|---|---|",
    ]
    for name, r in rows.items():
        lines.append(f"| {name} | {r['psnr']:.4f} | {r['ssim']:.5f} | "
                     f"{r['mse']:.6f} | {r['fid64']:.4f} |")
    lines.append("")
    lines.append(f"Max abs recon difference torch-vs-imported: "
                 f"`{blob['recon_max_abs_diff']:.2e}` "
                 f"(full data: docs/PARITY_CHECKPOINT.json)")
    marker = "## Checkpoint-level parity"
    text = open(a.out).read() if os.path.exists(a.out) else ""
    if marker in text:   # replace a previous run's section
        text = text[:text.index(marker)].rstrip() + "\n"
    with open(a.out, "w") as f:
        f.write(text)
        f.write("\n".join(lines) + "\n")
    print(f"[parity] wrote {a.out} + docs/PARITY_CHECKPOINT.json")


if __name__ == "__main__":
    main()
