"""vgd_tpu — TPU-native generative-model framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`viniciusmenesessouza/VAE-GAN-based-model-for-image-generation-and-denoising`
(the importable name for "vae-gan-based-model-for-image-generation-and-
denoising_tpu"). Five model families on a shared kernel/data/metric substrate:

* VAE-GAN        (reference: vaegan_code.py)
* DCGAN / WGAN   (reference: gan_code.py)
* Denoising VAE  (reference: main_vae.py)
* Glow (2-D images + 1-D EEG)  (reference: nf_code.py / flow_eeg.py)
* DDPM diffusion UNet (attn / no-attn)  (reference: diffusion_model*.py,
  train_diffusion.py)

Design stance (TPU-first, not a port):
* NHWC tensor layout, bfloat16 matmul/conv compute with float32 params.
* Every training step (all optimizer updates included) is ONE jitted XLA
  program; no data-dependent Python control flow on the hot path.
* Data parallelism via ``jax.sharding.Mesh`` + ``NamedSharding`` — the batch
  axis is sharded and XLA inserts ICI collectives; BatchNorm statistics are
  global-batch by construction.
* Device-side data corruption (gaussian noise / occlusion rectangles) instead
  of CPU-side per-sample transforms.
"""

__version__ = "0.1.0"
