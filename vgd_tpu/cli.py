"""Unified CLI for every workload.

The reference toggles behaviour by editing ``__main__`` blocks (SURVEY.md §5
config system); only train_diffusion.py:69-76 has an argparse CLI. Here one
CLI covers train / eval / sample / denoise across the five model families:

  python -m vgd_tpu.cli vaegan    --data /path/celebahq --epochs 150
  python -m vgd_tpu.cli vae       --epochs 100 --noise-std 0.5
  python -m vgd_tpu.cli gan       --epochs 150 --batch-size 128
  python -m vgd_tpu.cli wgan      --epochs 1500
  python -m vgd_tpu.cli glow      --iters 30000 --image-size 64
  python -m vgd_tpu.cli glow-eeg  --iters 6000 --event-type mi
  python -m vgd_tpu.cli diffusion --epochs 100 --timesteps 1000 [--no-attn]
  python -m vgd_tpu.cli denoise   --ckpt runs/vae/ckpt --input img.jpg
  python -m vgd_tpu.cli tstr      --method synt   # EEG downstream eval

Evaluation / sampling of trained checkpoints (the reference's runnable eval
scripts gan_code.py:147, nf_code.py:647, test_diffusion.py:41,
main_vae.py:215-641):

  python -m vgd_tpu.cli eval-gan       --out-dir runs/gan --fid
  python -m vgd_tpu.cli eval-vae       --out-dir runs/vae [--occlusion]
  python -m vgd_tpu.cli eval-glow      --out-dir runs/glow --fid
  python -m vgd_tpu.cli eval-diffusion --out-dir runs/diffusion
  python -m vgd_tpu.cli sample --family glow --out-dir runs/glow -n 16

``--fid`` enables IS/FID via the Flax InceptionV3 (random-init surrogate
features unless --inception-weights points at a torch InceptionV3
state_dict, e.g. pytorch-fid's pt_inception-2015-12-05).

With no --data, a synthetic dataset is used (smoke/bench runs work without
any downloads).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys

from vgd_tpu.core import config as C


def _add_common(p):
    p.add_argument("--data", type=str, default=None,
                   help="folder of *.jpg (default: synthetic)")
    p.add_argument("--out-dir", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--dataset-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--steps-per-epoch", type=int, default=None,
                   help="truncate epochs (smoke runs)")
    p.add_argument("--keep-checkpoints", type=int, default=None,
                   help="checkpoint retention count (default 3; raise for "
                   "eval-gan/eval-vae checkpoint sweeps over a whole run)")
    p.add_argument("--no-epoch-scan", action="store_true",
                   help="epoch-driven trainers: force per-step dispatch "
                   "(default for gan/vae per the measured A/B; vaegan and "
                   "diffusion default to the streaming epoch scan)")
    p.add_argument("--epoch-scan", action="store_true",
                   help="force the device-resident streaming epoch scan "
                   "(opt-in for gan/vae)")
    p.add_argument("--compute-dtype", type=str, default=None,
                   choices=["bfloat16", "float32"])
    p.add_argument("--resume", action="store_true")
    p.add_argument("--profile-dir", type=str, default=None)
    p.add_argument("--debug-nans", action="store_true")
    p.add_argument("--fused-conv", action="store_true",
                   help="Pallas fused conv+BN+LeakyReLU train path "
                   "(encoder/discriminator stacks)")
    p.add_argument("--prng-impl", type=str, default=None,
                   choices=["rbg", "threefry2x32"],
                   help="PRNG key family for the training loop (default "
                   "rbg: +7.9%% throughput / -7%% step time vs threefry, "
                   "BASELINE.md)")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize() before backend use "
                   "(TPU pods; mesh then spans all hosts)")
    p.add_argument("--device", type=str, default=None,
                   choices=["cpu", "tpu"],
                   help="force the jax platform (config API, before first "
                   "backend touch — env vars cannot override a registered "
                   "plugin). cpu enables accelerator-free smoke runs")
    p.add_argument("--num-cpu-devices", type=int, default=None,
                   help="with --device cpu: number of virtual CPU devices "
                   "(mesh smoke tests)")
    p.add_argument("--mesh-data", type=int, default=None,
                   help="data-parallel mesh axis size (-1 = all devices "
                   "not used by --mesh-model; default -1)")
    p.add_argument("--mesh-model", type=int, default=None,
                   help="model mesh axis size: >1 shards the Glow coupling "
                   "filters (tensor parallel) / the UNet token axis "
                   "(sequence parallel) across devices")


def _add_fid(p):
    p.add_argument("--fid", action="store_true",
                   help="compute IS/FID (per-epoch for training commands)")
    p.add_argument("--inception-weights", type=str, default=None,
                   help="torch InceptionV3 state_dict for true FID/IS "
                   "(implies --fid)")


def _data_cfg(base: C.DataConfig, a) -> C.DataConfig:
    kw = {}
    if a.data is not None:
        kw["path"] = a.data
    if a.batch_size is not None:
        kw["batch_size"] = a.batch_size
    if a.image_size is not None:
        kw["image_size"] = (a.image_size, a.image_size)
    if a.dataset_size is not None:
        kw["dataset_size"] = a.dataset_size
    return dataclasses.replace(base, **kw)


def _run_cfg(base: C.RunConfig, a, default_out: str) -> C.RunConfig:
    kw = {"seed": a.seed, "out_dir": a.out_dir or default_out}
    if a.compute_dtype is not None:
        kw["compute_dtype"] = a.compute_dtype
    if a.profile_dir is not None:
        kw["profile_dir"] = a.profile_dir
    if a.debug_nans:
        kw["debug_nans"] = True
    if getattr(a, "fused_conv", False):
        kw["fused_conv"] = True
    if getattr(a, "prng_impl", None):
        kw["prng_impl"] = a.prng_impl
    if getattr(a, "multihost", False):
        kw["multihost"] = True
    if getattr(a, "keep_checkpoints", None) is not None:
        kw["keep_checkpoints"] = a.keep_checkpoints
    if getattr(a, "mesh_data", None) is not None or \
            getattr(a, "mesh_model", None) is not None:
        kw["mesh"] = C.MeshConfig(
            data=a.mesh_data if a.mesh_data is not None else -1,
            model=a.mesh_model if a.mesh_model is not None else 1)
    return dataclasses.replace(base, **kw)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="vgd_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for name in ("vaegan", "vae", "gan", "wgan", "glow", "glow-eeg",
                 "diffusion"):
        p = sub.add_parser(name)
        _add_common(p)
        if name == "vaegan":
            _add_fid(p)
        if name == "vae":
            p.add_argument("--noise-std", type=float, default=0.5)
            p.add_argument("--occlusion", action="store_true",
                           help="train with occlusion-rectangle corruption "
                           "(dataset_code.py:44-56 pipeline)")
        if name == "glow":
            p.add_argument("--pp-stages", type=int, default=None,
                           help="pipeline-parallel stages: every block's "
                           "K-flow chain runs as a GPipe ring over this "
                           "many model-axis devices (K must divide it); "
                           "sizes --mesh-model automatically when unset")
            p.add_argument("--remat", action="store_true",
                           help="jax.checkpoint the flow scan: activation "
                           "memory O(K)->O(1), enables batch>=256 "
                           "(~5%% step-time cost)")
            p.add_argument("--fused-coupling", action="store_true",
                           help="Pallas fused coupling NN: the whole "
                           "conv-relu-conv-relu-zeroconv chain per flow "
                           "stays in VMEM (ops/glow_coupling.py)")
            p.add_argument("--flow-stack", nargs="?", const="all",
                           default=None, metavar="POSITIONS",
                           help="ONE Pallas kernel per block per direction "
                           "for the whole K-flow stack, activation "
                           "VMEM-resident across flows "
                           "(ops/glow_flow_stack.py). Bare flag = every "
                           "block; an int N = only blocks whose squeezed "
                           "h*w <= N (e.g. 256: the 16x16-and-smaller "
                           "deep blocks where the scan is launch-bound)")
        if name == "glow-eeg":
            p.add_argument("--event-type", default="mi",
                           choices=["mi", "baseline"])
            p.add_argument("--eeg-path", type=str, default=None)
        if name == "diffusion":
            p.add_argument("--timesteps", type=int, default=1000)
            p.add_argument("--no-attn", action="store_true")

    p = sub.add_parser("denoise", help="encode->decode restoration "
                       "(main_vae.py test_img capability)")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--input", required=True, help="image file or folder")
    p.add_argument("--output", default="denoised.png")
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)

    # eval / sample subcommands over trained checkpoints
    for name in ("eval-gan", "eval-vae", "eval-glow", "eval-diffusion"):
        p = sub.add_parser(name)
        _add_common(p)
        _add_fid(p)
        p.add_argument("--step", type=int, default=None,
                       help="checkpoint step (default: latest)")
        p.add_argument("--max-batches", type=int, default=None)
        if name == "eval-gan":
            p.add_argument("--wgan", action="store_true")
            p.add_argument("--max-checkpoints", type=int, default=None)
        if name == "eval-vae":
            p.add_argument("--occlusion", action="store_true",
                           help="occlusion test-set evaluation "
                           "(main_vae.py:236-343); alone it replaces the "
                           "aggregated-posterior sweep, with --fid both run")
            p.add_argument("--max-checkpoints", type=int, default=None)
            p.add_argument("--noise-std", type=float, default=0.5)
        if name == "eval-diffusion":
            p.add_argument("--timesteps", type=int, default=1000)
            p.add_argument("--no-attn", action="store_true")

    p = sub.add_parser("eval-eeg", help="real-vs-fake PSD comparison + "
                       "training-evolution GIF (test_eegglow.py:12-46)")
    _add_common(p)
    p.add_argument("--event-type", default="mi",
                   choices=["mi", "baseline"])
    p.add_argument("--eeg-path", type=str, default=None)
    p.add_argument("--n-fake", type=int, default=64)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--flows", type=int, default=None)
    p.add_argument("--blocks", type=int, default=None)
    p.add_argument("--filter-size", type=int, default=None)

    p = sub.add_parser("sample", help="sample grid from a trained "
                       "checkpoint")
    _add_common(p)
    p.add_argument("--family", required=True,
                   choices=["vaegan", "vae", "gan", "wgan", "glow",
                            "glow-eeg", "diffusion"])
    p.add_argument("-n", "--num-samples", type=int, default=64)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--ddim-steps", type=int, default=0,
                   help="diffusion only: >0 samples through the strided "
                   "DDIM chain (e.g. 50) instead of the full ancestral "
                   "chain — ~T/steps faster")
    p.add_argument("--ddim-eta", type=float, default=0.0,
                   help="DDIM stochasticity (0=deterministic, 1=DDPM "
                   "posterior noise)")
    p.add_argument("--no-attn", action="store_true")
    p.add_argument("--event-type", default="mi",
                   choices=["mi", "baseline"])

    p = sub.add_parser("export", help="AOT serving export: compile a "
                       "trained checkpoint's inference path (sampler or "
                       "denoiser) into a self-contained StableHLO artifact "
                       "lowered for tpu+cpu, parameters baked in "
                       "(io/export.py; run it with `infer`)")
    _add_common(p)
    p.add_argument("--family", required=True,
                   choices=["vaegan", "vae", "gan", "wgan", "glow",
                            "glow-eeg", "diffusion"])
    p.add_argument("--mode", default="sample",
                   choices=["sample", "denoise"],
                   help="sample: seed -> image grid batch; denoise: "
                   "(images, seed) -> reconstructions (vae/vaegan)")
    p.add_argument("-n", "--num-samples", type=int, default=64)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--ddim-steps", type=int, default=0)
    p.add_argument("--ddim-eta", type=float, default=0.0)
    p.add_argument("--no-attn", action="store_true")
    p.add_argument("--event-type", default="mi",
                   choices=["mi", "baseline"])
    p.add_argument("--platforms", type=str, default="tpu,cpu",
                   help="comma-separated lowering targets")
    p.add_argument("--artifact", type=str, default=None,
                   help="output path (default "
                   "<out-dir>/serving_<family>_<mode>.jaxexport)")
    p.add_argument("--poly-batch", action="store_true",
                   help="denoise exports: symbolic batch dimension — one "
                   "artifact serves any request batch size (no client-side "
                   "padding/tiling)")

    p = sub.add_parser("infer", help="load a `export` artifact and run one "
                       "serving call (no model code / checkpoint needed)")
    p.add_argument("--artifact", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default=None,
                   help="output grid jpg (images) / png (eeg); default "
                   "next to the artifact")
    p.add_argument("--input", type=str, default=None,
                   help="denoise artifacts: .npy batch or image file")
    p.add_argument("--device", type=str, default=None,
                   choices=["cpu", "tpu"])
    p.add_argument("--num-cpu-devices", type=int, default=None)

    p = sub.add_parser("tstr", help="EEG TSTR downstream eval "
                       "(test_eegglow.py capability)")
    p.add_argument("--method", default="synt",
                   choices=["synt", "real", "sr", "other_sub"])
    p.add_argument("--eeg-path", type=str, default=None)
    p.add_argument("--ckpt-dir", type=str, default="runs/glow_eeg")
    p.add_argument("--subjects", nargs="*", default=["01"])
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--flows", type=int, default=32)
    p.add_argument("--blocks", type=int, default=4)
    p.add_argument("--filter-size", type=int, default=512)
    p.add_argument("--n-samples", type=int, default=288)

    a = ap.parse_args(argv)
    if getattr(a, "device", None):
        # Must precede the first backend touch. The config API is the only
        # reliable override on hosts where an accelerator plugin registers
        # itself from sitecustomize (env vars are read before that).
        import jax

        jax.config.update("jax_platforms", a.device)
        if a.device == "cpu" and getattr(a, "num_cpu_devices", None):
            jax.config.update("jax_num_cpu_devices", a.num_cpu_devices)
    from vgd_tpu.train import loop as L

    if a.cmd == "vaegan":
        cfg = C.VAEGANConfig()
        cfg = dataclasses.replace(
            cfg, data=_data_cfg(cfg.data, a),
            run=_run_cfg(cfg.run, a, "runs/vaegan"),
            **({"epochs": a.epochs} if a.epochs is not None else {}),
            **({"lr": a.lr} if a.lr is not None else {}))
        feature_fn, _ = L.load_feature_fn(a.fid, a.inception_weights)
        L.run_vaegan(cfg, max_steps_per_epoch=a.steps_per_epoch,
                     feature_fn=feature_fn, resume=a.resume,
                     epoch_scan=(False if a.no_epoch_scan else
                                 (True if a.epoch_scan else None)))
    elif a.cmd == "vae":
        cfg = C.VAEConfig()
        data = dataclasses.replace(_data_cfg(cfg.data, a),
                                   noise_max_std=a.noise_std,
                                   occlusion=a.occlusion)
        cfg = dataclasses.replace(
            cfg, data=data, run=_run_cfg(cfg.run, a, "runs/vae"),
            **({"epochs": a.epochs} if a.epochs is not None else {}),
            **({"lr": a.lr} if a.lr is not None else {}))
        L.run_vae(cfg, max_steps_per_epoch=a.steps_per_epoch,
                  resume=a.resume,
                  epoch_scan=(False if a.no_epoch_scan else
                                 (True if a.epoch_scan else None)))
    elif a.cmd in ("gan", "wgan"):
        cfg = C.GANConfig(wgan=(a.cmd == "wgan"))
        # WGAN reference scale is 1500 epochs (gan_code.py:288) vs DCGAN's
        # 150; apply it unless the user overrides
        epochs = a.epochs if a.epochs is not None else \
            (1500 if a.cmd == "wgan" else None)
        cfg = dataclasses.replace(
            cfg, data=_data_cfg(cfg.data, a),
            run=_run_cfg(cfg.run, a, f"runs/{a.cmd}"),
            **({"epochs": epochs} if epochs is not None else {}),
            **({"lr": a.lr} if a.lr is not None else {}))
        L.run_gan(cfg, max_steps_per_epoch=a.steps_per_epoch,
                  resume=a.resume,
                  epoch_scan=(False if a.no_epoch_scan else
                                 (True if a.epoch_scan else None)))
    elif a.cmd == "glow":
        cfg = C.GlowConfig()
        if getattr(a, "pp_stages", None) and a.mesh_model is None:
            a.mesh_model = a.pp_stages   # size the model axis to the stages
        cfg = dataclasses.replace(
            cfg, data=_data_cfg(cfg.data, a),
            run=_run_cfg(cfg.run, a, "runs/glow"),
            **({"pp_stages": a.pp_stages}
               if getattr(a, "pp_stages", None) else {}),
            **({"n_iter": a.iters} if a.iters is not None else {}),
            **({"lr": a.lr} if a.lr is not None else {}),
            **({"remat": True} if getattr(a, "remat", False) else {}),
            **({"fused_coupling": True}
               if getattr(a, "fused_coupling", False) else {}),
            **({"flow_stack": True if a.flow_stack == "all"
                else int(a.flow_stack)}
               if getattr(a, "flow_stack", None) is not None else {}))
        L.run_glow(cfg, resume=a.resume)
    elif a.cmd == "glow-eeg":
        cfg = C.GlowEEGConfig(event_type=a.event_type, eeg_path=a.eeg_path)
        cfg = dataclasses.replace(
            cfg, run=_run_cfg(cfg.run, a, "runs/glow_eeg"),
            **({"n_iter": a.iters} if a.iters is not None else {}),
            **({"batch_size": a.batch_size} if a.batch_size is not None else {}),
            **({"lr": a.lr} if a.lr is not None else {}))
        L.run_glow_eeg(cfg, resume=a.resume)
    elif a.cmd == "diffusion":
        cfg = C.DiffusionConfig(timesteps=a.timesteps,
                                attention=not a.no_attn)
        cfg = dataclasses.replace(
            cfg, data=_data_cfg(cfg.data, a),
            run=_run_cfg(cfg.run, a, "runs/diffusion"),
            **({"epochs": a.epochs} if a.epochs is not None else {}),
            **({"lr": a.lr} if a.lr is not None else {}))
        L.run_diffusion(cfg, max_steps_per_epoch=a.steps_per_epoch,
                        resume=a.resume,
                        epoch_scan=(False if a.no_epoch_scan else
                                 (True if a.epoch_scan else None)))
    elif a.cmd == "eval-gan":
        cfg = C.GANConfig(wgan=a.wgan)
        cfg = dataclasses.replace(
            cfg, data=_data_cfg(cfg.data, a),
            run=_run_cfg(cfg.run, a, f"runs/{'wgan' if a.wgan else 'gan'}"))
        feature_fn, _ = L.load_feature_fn(a.fid, a.inception_weights)
        res = L.evaluate_gan_checkpoints(cfg, feature_fn=feature_fn,
                                         max_checkpoints=a.max_checkpoints)
        print(json.dumps(res))
    elif a.cmd == "eval-vae":
        cfg = C.VAEConfig()
        data = dataclasses.replace(_data_cfg(cfg.data, a),
                                   noise_max_std=a.noise_std)
        cfg = dataclasses.replace(cfg, data=data,
                                  run=_run_cfg(cfg.run, a, "runs/vae"))
        # --occlusion COMPOSES with the checkpoint sweep (it used to replace
        # it, silently dropping the aggregated-posterior FID sweep —
        # VERDICT r4 item 4). Default (no flags) runs the sweep alone.
        res = {}
        if a.occlusion:
            res["occlusion"] = L.evaluate_vae_occlusion(
                cfg, max_batches=a.max_batches, step=a.step)
        if a.fid or not a.occlusion:
            feature_fn, _ = L.load_feature_fn(a.fid, a.inception_weights)
            res["sweep"] = L.evaluate_vae_checkpoints(
                cfg, feature_fn=feature_fn,
                max_checkpoints=a.max_checkpoints,
                max_eval_batches=a.max_batches)
        print(json.dumps(res))
    elif a.cmd == "eval-glow":
        cfg = C.GlowConfig()
        cfg = dataclasses.replace(cfg, data=_data_cfg(cfg.data, a),
                                  run=_run_cfg(cfg.run, a, "runs/glow"))
        feature_fn, _ = L.load_feature_fn(a.fid, a.inception_weights)
        res = L.evaluate_glow_from_dir(cfg, feature_fn=feature_fn,
                                       max_batches=a.max_batches,
                                       step=a.step)
        print(json.dumps(res))
    elif a.cmd == "eval-diffusion":
        cfg = C.DiffusionConfig(timesteps=a.timesteps,
                                attention=not a.no_attn)
        cfg = dataclasses.replace(cfg, data=_data_cfg(cfg.data, a),
                                  run=_run_cfg(cfg.run, a, "runs/diffusion"))
        feature_fn, _ = L.load_feature_fn(a.fid, a.inception_weights)
        res = L.evaluate_diffusion_from_dir(cfg, feature_fn=feature_fn,
                                            max_batches=a.max_batches,
                                            step=a.step)
        print(json.dumps(res))
    elif a.cmd == "eval-eeg":
        cfg = C.GlowEEGConfig(
            event_type=a.event_type, eeg_path=a.eeg_path,
            **({"n_flows": a.flows} if a.flows is not None else {}),
            **({"n_blocks": a.blocks} if a.blocks is not None else {}),
            **({"filter_size": a.filter_size} if a.filter_size is not None else {}))
        cfg = dataclasses.replace(
            cfg, run=_run_cfg(cfg.run, a, "runs/glow_eeg"),
            **({"batch_size": a.batch_size} if a.batch_size is not None else {}))
        res = L.eeg_psd_and_gif(cfg, n_fake=a.n_fake, step=a.step)
        print(json.dumps(res))
    elif a.cmd == "sample":
        cfg = _sample_cfg(a)
        L.sample_from_dir(a.family, cfg, n=a.num_samples, out_path=a.out,
                          step=a.step, seed=a.seed,
                          ddim_steps=a.ddim_steps, ddim_eta=a.ddim_eta)
    elif a.cmd == "export":
        from vgd_tpu.io.export import export_serving
        cfg = _sample_cfg(a)
        export_serving(a.family, cfg, n=a.num_samples, mode=a.mode,
                       step=a.step, ddim_steps=a.ddim_steps,
                       ddim_eta=a.ddim_eta,
                       platforms=tuple(s.strip() for s in
                                       a.platforms.split(",") if s.strip()),
                       artifact_path=a.artifact, seed=a.seed,
                       poly_batch=a.poly_batch)
    elif a.cmd == "infer":
        _infer(a)
    elif a.cmd == "denoise":
        _denoise(a)
    elif a.cmd == "tstr":
        _tstr(a)
    return 0


def _sample_cfg(a):
    """Family config for the ``sample`` subcommand."""
    if a.family == "vaegan":
        cfg = C.VAEGANConfig()
    elif a.family == "vae":
        cfg = C.VAEConfig()
    elif a.family in ("gan", "wgan"):
        cfg = C.GANConfig(wgan=(a.family == "wgan"))
    elif a.family == "glow":
        cfg = C.GlowConfig()
        if a.temperature is not None:
            cfg = dataclasses.replace(cfg, temperature=a.temperature)
    elif a.family == "glow-eeg":
        cfg = C.GlowEEGConfig(event_type=a.event_type)
        if a.temperature is not None:
            cfg = dataclasses.replace(cfg, temperature=a.temperature)
        return dataclasses.replace(
            cfg, run=_run_cfg(cfg.run, a, "runs/glow_eeg"))
    else:
        cfg = C.DiffusionConfig(timesteps=a.timesteps,
                                attention=not a.no_attn)
    return dataclasses.replace(cfg, data=_data_cfg(cfg.data, a),
                               run=_run_cfg(cfg.run, a,
                                            f"runs/{a.family}"))


def _infer(a):
    """Run one serving call on an `export` artifact — the deployment-side
    counterpart of `export`: no model code, config, or checkpoint is
    touched, only the self-contained StableHLO program."""
    import os

    import numpy as np

    from vgd_tpu.io.export import load_artifact, run_artifact

    call, meta = load_artifact(a.artifact)   # ONE deserialization; the
    # (call, meta) pair is passed to run_artifact below (ADVICE r4)
    inputs = None
    if meta.get("mode") == "denoise":
        if not a.input:
            raise SystemExit("denoise artifact needs --input "
                             "(.npy batch or image file)")
        if a.input.endswith(".npy"):
            inputs = np.load(a.input).astype(np.float32)
            if inputs.ndim == 3:                 # single [H, W, C] image
                inputs = inputs[None]
            if inputs.ndim != 4:
                raise SystemExit(f"--input {a.input}: expected [H,W,C] or "
                                 f"[N,H,W,C], got shape {inputs.shape}")
        else:
            from PIL import Image
            size = tuple(meta["config"]["data"]["image_size"])
            img = Image.open(a.input).convert("RGB").resize(size)
            inputs = (np.asarray(img, np.float32)[None] / 127.5 - 1.0)
        if not meta.get("poly_batch"):
            # static-batch artifact: pad/truncate the request to exported n
            n = int(meta["n"])
            if inputs.shape[0] > n:
                print(f"[infer] warning: --input batch {inputs.shape[0]} > "
                      f"exported n={n}; only the first {n} rows are "
                      f"processed (re-export with --poly-batch to serve "
                      f"any batch size)")
            reps = -(-n // inputs.shape[0])      # pad by repetition to n
            inputs = np.tile(inputs, (reps, 1, 1, 1))[:n]
    out = run_artifact(seed=a.seed, inputs=inputs, loaded=(call, meta))
    base = a.out or a.artifact.rsplit(".", 1)[0]
    if meta.get("family") == "glow-eeg":
        from vgd_tpu.data.eeg import CHANNEL_NAMES
        from vgd_tpu.utils.viz import plot_eeg_signals
        dst = base if base.endswith(".png") else base + ".png"
        arr = out[:, :, 0, :].transpose(0, 2, 1)
        plot_eeg_signals(arr, dst, channel_names=CHANNEL_NAMES)
        np.savez(dst.rsplit(".", 1)[0] + ".npz", signals=out)
    else:
        from vgd_tpu.io.artifacts import save_grid
        dst = base if base.endswith((".jpg", ".png")) else base + ".jpg"
        save_grid(out, dst)
    print(f"[infer] {a.artifact} (mode={meta.get('mode', 'sample')}) "
          f"-> {dst}  out shape {out.shape}")


def _denoise(a):
    """Single-image / folder denoising via a trained VAE checkpoint
    (main_vae.py:376-413 test_img capability)."""
    import glob as g
    import os
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image
    from vgd_tpu.core.config import VAEConfig, DataConfig
    from vgd_tpu.io.checkpoint import Checkpointer
    from vgd_tpu.train.vae import VAETrainer

    size = (a.image_size, a.image_size)
    cfg = VAEConfig(data=DataConfig(image_size=size))
    trainer = VAETrainer(cfg, size + (3,))
    key = jax.random.key(a.seed)
    template = trainer.init(key, 1)
    ckpt = Checkpointer(a.ckpt)
    state, _, step = ckpt.restore(template)
    print(f"restored checkpoint step {step}")

    paths = ([a.input] if os.path.isfile(a.input)
             else sorted(g.glob(os.path.join(a.input, "*.jpg"))))
    for p in paths:
        img = Image.open(p).convert("RGB").resize(size)
        x = jnp.asarray(np.asarray(img), jnp.float32)[None] / 127.5 - 1.0
        out = trainer.denoise(state, x, key)
        out_u8 = np.asarray(jnp.clip((out[0] + 1) * 127.5, 0, 255)
                            ).astype(np.uint8)
        dst = (a.output if len(paths) == 1 else
               os.path.join(os.path.dirname(a.output) or ".",
                            f"denoised_{os.path.basename(p)}"))
        Image.fromarray(out_u8).save(dst)
        print(f"{p} -> {dst}")


def _tstr(a):
    """EEG TSTR protocol (test_eegglow.py:105-197): train CSP+LDA on
    {synthetic, real, both, other-subject} data, test on real E-session."""
    import os

    import numpy as np
    from vgd_tpu.data.eeg import EEGDataset
    from vgd_tpu.eval.eeg_downstream import tstr_evaluate

    if a.method in ("synt", "sr"):
        # fail BEFORE any backend/data work with an actionable message —
        # a missing flow checkpoint used to surface as a FileNotFoundError
        # out of orbax half-way through the protocol (VERDICT r4 item 2)
        def _has_ckpt(d):
            return os.path.isdir(d) and any(
                s.isdigit() for s in os.listdir(d))
        missing = [os.path.join(a.ckpt_dir, f"ckpt_{e}")
                   for e in ("mi", "baseline")
                   if not _has_ckpt(os.path.join(a.ckpt_dir, f"ckpt_{e}"))]
        if missing:
            raise SystemExit(
                f"tstr --method {a.method} samples trained per-class EEG "
                f"flows, but no checkpoint exists under: "
                f"{', '.join(missing)}.\nTrain them first:\n"
                f"  python -m vgd_tpu.cli glow-eeg --iters 6000 "
                f"--event-type mi --out-dir {a.ckpt_dir}\n"
                f"  python -m vgd_tpu.cli glow-eeg --iters 6000 "
                f"--event-type baseline --out-dir {a.ckpt_dir}")
    results = {}
    for i, subject in enumerate(a.subjects):
        te_mi = EEGDataset(a.eeg_path, "E", "mi", subject).as_ncT()
        te_bl = EEGDataset(a.eeg_path, "E", "baseline", subject).as_ncT()
        X_test = np.concatenate([te_mi, te_bl]).astype(np.float64)
        y_test = np.concatenate([np.ones(len(te_mi)), np.zeros(len(te_bl))])

        X_parts, y_parts = [], []
        if a.method in ("synt", "sr"):
            X_mi, X_bl = _generate_synthetic_eeg(a)
            X_parts += [X_mi, X_bl]
            y_parts += [np.ones(len(X_mi)), np.zeros(len(X_bl))]
        if a.method in ("real", "sr", "other_sub"):
            src = (a.subjects[i - 1] if a.method == "other_sub" else subject)
            tr_mi = EEGDataset(a.eeg_path, "T", "mi", src).as_ncT()
            tr_bl = EEGDataset(a.eeg_path, "T", "baseline", src).as_ncT()
            X_parts += [tr_mi, tr_bl]
            y_parts += [np.ones(len(tr_mi)), np.zeros(len(tr_bl))]
        X_train = np.concatenate(X_parts).astype(np.float64)
        y_train = np.concatenate(y_parts)

        train_scores, test_scores = tstr_evaluate(X_train, y_train,
                                                  X_test, y_test)
        results[subject] = {"train": train_scores, "test": test_scores}
        print(f"subject {subject} method {a.method}: "
              f"train {train_scores} | test {test_scores}")
    print(json.dumps(results))


def _generate_synthetic_eeg(a, n_samples: int = None):
    """Sample trained per-class EEG flows (test_eegglow.py:55-77)."""
    import os
    import jax
    import numpy as np
    from vgd_tpu.core.config import GlowEEGConfig
    from vgd_tpu.io.checkpoint import Checkpointer
    from vgd_tpu.train.glow import GlowEEGTrainer

    n_samples = n_samples or getattr(a, "n_samples", 288)
    out = []
    for etype in ("mi", "baseline"):
        cfg = GlowEEGConfig(event_type=etype,
                            n_flows=getattr(a, "flows", 32),
                            n_blocks=getattr(a, "blocks", 4),
                            filter_size=getattr(a, "filter_size", 512))
        trainer = GlowEEGTrainer(cfg)
        key = jax.random.key(42)
        template = trainer.init(key, 16)
        ckpt = Checkpointer(os.path.join(a.ckpt_dir, f"ckpt_{etype}"))
        state, _, _ = ckpt.restore(template)
        z = trainer.sample_z(key, n_samples)
        fakes = trainer.reverse(state, z)    # (N, T, 1, C)
        arr = np.asarray(fakes)[:, :, 0, :].transpose(0, 2, 1)
        finite = np.isfinite(arr).all(axis=(1, 2))
        if not finite.all():
            print(f"warning: dropping {int((~finite).sum())}/{len(arr)} "
                  f"non-finite generated '{etype}' trials (undertrained "
                  f"flow reverses can overflow)")
            arr = arr[finite]
        if len(arr) == 0:
            raise RuntimeError(
                f"all generated '{etype}' trials are non-finite — train the "
                f"flow longer before TSTR (reference uses 6000 iters, "
                f"flow_eeg.py:461)")
        out.append(arr)
    return out[0], out[1]


if __name__ == "__main__":
    sys.exit(main())
