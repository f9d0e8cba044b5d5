"""Typed configuration for every workload.

The reference scatters hyperparameters as hard-coded constants in ``__main__``
blocks (e.g. vaegan_code.py:22-26, nf_code.py:711-724) with one argparse CLI
(train_diffusion.py:69-76). Here every workload has a frozen dataclass whose
defaults reproduce the reference's published training scale, and a single CLI
(vgd_tpu/cli.py) overrides fields uniformly.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. ``data`` is the DP axis; ``model`` is reserved for
    tensor-parallel sharding of wide layers (Glow 512-filter couplings) when
    scaling up. Reference parallelism was single-process nn.DataParallel only
    (nf_code.py:732); here the mesh generalises to multi-chip/multi-host."""
    data: int = -1   # -1 => all remaining devices
    model: int = 1


@dataclass(frozen=True)
class DataConfig:
    """CelebA(-HQ) pipeline. Reference: dataset_code.py:13-178."""
    path: Optional[str] = None          # folder of *.jpg; None => synthetic data
    image_size: Tuple[int, int] = (64, 64)
    channels: int = 3
    batch_size: int = 64
    train_fraction: float = 0.9         # dataset_code.py:173 90/10 random split
    dataset_size: Optional[int] = None  # truncate dataset (dataset_code.py:20-21)
    # corruption (dataset_code.py:35-56); applied ON DEVICE here
    noise_max_std: Optional[float] = None
    occlusion: bool = True              # random uniform-noise rectangle
    normalize: bool = True              # True => [-1,1] ('HQ'); False => [0,1] ('LQ')
    prefetch: int = 2


@dataclass(frozen=True)
class OptimConfig:
    lr: float = 2e-4
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8


@dataclass(frozen=True)
class RunConfig:
    """Common training-run knobs shared by all trainers."""
    seed: int = 42
    out_dir: str = "runs/default"
    checkpoint_every_epochs: int = 1
    checkpoint_every_iters: int = 1000   # iteration-driven trainers (Glow)
    sample_every_iters: int = 100
    eval_metrics: bool = True
    keep_checkpoints: int = 3
    compute_dtype: str = "bfloat16"      # conv/matmul compute dtype
    param_dtype: str = "float32"
    # PRNG family for training-loop keys: "rbg" (XLA RngBitGenerator) is
    # 7.9% faster on the flagship step than jax's threefry default
    # (4.48 vs 4.83 ms, BASELINE.md) and equally deterministic per seed;
    # "threefry2x32" reproduces the library-default stream.
    prng_impl: str = "rbg"
    # Multi-host: call jax.distributed.initialize() before backend use so
    # the mesh (built from jax.devices()) spans the pod and collectives
    # ride ICI within a slice / DCN across (SURVEY.md §2c). Auto-detects
    # coordinator/process env on TPU pods; no-op plumbing on one host.
    multihost: bool = False
    # Pallas fused conv+BN+LeakyReLU in encoder/discriminator train paths
    # (ops/fused_conv.py); default follows benchmarks/kernel_bench.py
    fused_conv: bool = False
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # observability (SURVEY.md §5): jax.profiler trace of a step window, and
    # NaN debugging (the TPU-side counterpart of cudnn.deterministic flags)
    profile_dir: Optional[str] = None
    profile_steps: Tuple[int, int] = (10, 20)
    debug_nans: bool = False


@dataclass(frozen=True)
class VAEGANConfig:
    """Flagship workload. Reference: vaegan_code.py:18-219."""
    data: DataConfig = field(default_factory=DataConfig)
    run: RunConfig = field(default_factory=lambda: RunConfig(out_dir="runs/vaegan"))
    latent_dim: int = 100               # vaegan_code.py:26
    epochs: int = 150                   # vaegan_code.py:25
    lr: float = 2e-4                    # vaegan_code.py:42-44 (3x Adam)
    alpha_kl: float = 0.1               # vaegan_code.py:49
    alpha_adv: float = 0.1              # vaegan_code.py:50
    kl_warmup_epochs: int = 50          # min(1, epoch/50)  vaegan_code.py:117
    label_real: float = 0.9             # label smoothing    vaegan_code.py:88-89
    label_fake: float = 0.1
    instance_noise: float = 0.05        # D-input noise      vaegan_code.py:91-92
    d_steps: int = 2                    # discriminator steps/batch vaegan_code.py:95
    ngf: int = 64
    ndf: int = 64
    # Reference README describes a Dis_l feature-reconstruction loss but the
    # code uses pixel MSE (vaegan_code.py:113). Pixel MSE is the default for
    # checkpoint parity; feature loss is available as an option.
    recon_loss: str = "pixel"           # "pixel" | "disl"
    val_noise_std: float = 0.05         # vaegan_code.py:153


@dataclass(frozen=True)
class GANConfig:
    """DCGAN / WGAN. Reference: gan_code.py:162-372."""
    data: DataConfig = field(default_factory=lambda: DataConfig(batch_size=128))
    run: RunConfig = field(default_factory=lambda: RunConfig(out_dir="runs/gan"))
    latent_dim: int = 100
    # DCGAN scale; the CLI's `wgan` subcommand defaults to the reference's
    # 1500 epochs (gan_code.py:288) when --epochs isn't given
    epochs: int = 150
    lr: float = 2e-4
    beta1: float = 0.5                  # gan_code.py:180-181 Adam betas (0.5, 0.999)
    beta2: float = 0.999
    ngf: int = 64
    ndf: int = 64
    wgan: bool = False
    clip_value: float = 0.01            # WGAN weight clipping gan_code.py:319-320
    critic_iters: int = 5               # gan_code.py:283


@dataclass(frozen=True)
class VAEConfig:
    """Denoising VAE. Reference: main_vae.py:60-213."""
    data: DataConfig = field(default_factory=lambda: DataConfig(
        noise_max_std=0.5, occlusion=False))
    run: RunConfig = field(default_factory=lambda: RunConfig(out_dir="runs/vae"))
    latent_dim: int = 100
    epochs: int = 100
    lr: float = 1e-3                    # main_vae.py:84-87 single joint Adam
    kl_weight: float = 1e-5             # main_vae.py:121
    kl_warmup_epochs: int = 50
    ngf: int = 64


@dataclass(frozen=True)
class GlowConfig:
    """Glow on images. Reference: nf_code.py:560-751."""
    data: DataConfig = field(default_factory=lambda: DataConfig(
        batch_size=16, normalize=False))
    # bf16 couplings by default: 1.9x step time, validated over the full
    # 30k-iter reference schedule — bits/dim tracks f32 within 0.010 at
    # every 1k-iter checkpoint, final 0.7233 vs 0.7130 (BASELINE.md).
    # PLU/logdet stay f32 either way; `--compute-dtype float32` restores
    # exact reference numerics.
    run: RunConfig = field(default_factory=lambda: RunConfig(
        out_dir="runs/glow", compute_dtype="bfloat16"))
    n_bits: int = 5                     # nf_code.py:712
    n_flows: int = 32                   # K, nf_code.py:717
    n_blocks: int = 4                   # L, nf_code.py:718
    filter_size: int = 512              # coupling width, nf_code.py:203
    n_iter: int = 30000                 # nf_code.py:715
    lr: float = 1e-4
    temperature: float = 0.7            # nf_code.py:716
    n_samples: int = 20
    # remat the per-flow scan body (jax.checkpoint): activation memory
    # O(K) -> O(1) per block, enabling batch >= 256 on a 16G chip
    # (benchmarks/glow_batch_scaling.py); +1 recompute in backward
    remat: bool = False
    # Pallas fused coupling NN (ops/glow_coupling.py): the whole
    # conv1->relu->conv2->relu->zeroconv chain per flow stays in VMEM,
    # removing the 512-wide intermediates' HBM round trips
    fused_coupling: bool = False
    # Strongest fusion: each block's whole K-flow stack (actnorm -> PLU 1x1
    # -> coupling) as ONE Pallas kernel per direction with weights
    # VMEM-resident (ops/glow_flow_stack.py); training forward only.
    # True = every block; an int = only blocks with squeezed h*w <= it
    # (the deep launch-latency-bound blocks — XLA wins the big ones,
    # benchmarks/glow_fused_bench.py)
    flow_stack: "bool | int" = False
    # lax.scan unroll factor for the per-flow chain: >1 inlines that many
    # flow bodies per loop iteration, letting XLA fuse across flow
    # boundaries and amortise loop overhead in the launch-latency-bound
    # small-batch regime (benchmarks/glow_unroll_bench.py). Math-identical
    # to unroll=1 (same ops, same order).
    scan_unroll: int = 1
    # Pipeline parallelism: >0 stages every block's K-flow chain as a GPipe
    # ring over that many model-axis devices (the mesh's model axis is sized
    # to match when unset); K must divide pp_stages. Mutually exclusive with
    # tensor-parallel filter sharding (--mesh-model without --pp-stages).
    pp_stages: int = 0
    pp_microbatches: int = 2


@dataclass(frozen=True)
class GlowEEGConfig:
    """1-D Glow on EEG. Reference: flow_eeg.py:343-465."""
    run: RunConfig = field(default_factory=lambda: RunConfig(
        out_dir="runs/glow_eeg", compute_dtype="float32"))
    eeg_path: Optional[str] = None      # folder of BCI-IV-2a .npz; None => synthetic
    num_channels: int = 22              # flow_eeg.py:12
    num_samples: int = 160              # 640 decimated x4 (flow_eeg.py:33-34)
    batch_size: int = 16
    n_flows: int = 32
    n_blocks: int = 4
    filter_size: int = 512
    n_iter: int = 6000                  # flow_eeg.py:461
    lr: float = 1e-3                    # torch.optim.Adam default (flow_eeg.py:447)
    temperature: float = 0.7
    event_type: str = "mi"              # "mi" | "baseline"
    n_samples: int = 16


@dataclass(frozen=True)
class DiffusionConfig:
    """DDPM. Reference: train_diffusion.py:68-151."""
    data: DataConfig = field(default_factory=lambda: DataConfig(
        batch_size=16, image_size=(256, 256)))
    run: RunConfig = field(default_factory=lambda: RunConfig(out_dir="runs/diffusion"))
    epochs: int = 100
    lr: float = 2e-4
    timesteps: int = 1000
    beta_start: float = 1e-4            # train_diffusion.py:35
    beta_end: float = 0.02
    base_ch: int = 64
    time_emb_dim: int = 256
    attention: bool = True              # diffusion_model.py vs diffusion_model_no_attn.py


def replace(cfg, **kw):
    """Functional update helper for frozen configs."""
    return dataclasses.replace(cfg, **kw)
