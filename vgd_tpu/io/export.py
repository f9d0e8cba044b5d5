"""AOT serving export: compile a trained checkpoint's inference path into a
self-contained, versioned StableHLO artifact via ``jax.export``.

The reference has no deployment story at all — its samplers and denoisers
are interactive script loops re-running eager torch modules
(main_vae.py:348-413, gan_code.py:121-122, nf_code.py:613-621,
test_diffusion.py:124-155). This is the TPU-native production counterpart:
the whole inference program (PRNG, latent draw, generator/decoder forward,
or the full compiled DDIM/ancestral diffusion chain) is traced ONCE,
lowered for BOTH ``tpu`` and ``cpu`` platforms, and serialized with the
trained parameters baked in as graph constants. A serving process loads the
artifact and calls it WITHOUT the model code, the config, or the orbax
checkpoint — one file is the deployable unit, and the same file runs on a
TPU worker and on a CPU canary.

Artifact layout: ``<path>`` holds the serialized ``jax.export`` blob;
``<path>.json`` is a human-readable sidecar (family, mode, shapes,
platforms, checkpoint step) that loaders and fleets can index without
deserializing the program.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

FORMAT_VERSION = 1
# Cross-platform-stable PRNG: the exported program must produce the same
# sample stream on a TPU worker and a CPU canary, so the seed is expanded
# with threefry regardless of the training-side default (rbg is faster for
# training steps but its bit stream is backend-shaped).
_KEY_IMPL = "threefry2x32"


def _key(seed: jax.Array) -> jax.Array:
    return jax.random.key(seed, impl=_KEY_IMPL)


def build_serving_fn(family: str, cfg, trainer, state, n: int,
                     mode: str = "sample", ddim_steps: int = 0,
                     ddim_eta: float = 0.0, poly_batch: bool = False
                     ) -> Tuple[Callable, Tuple[jax.ShapeDtypeStruct, ...]]:
    """Return ``(fn, example_args)`` for the family's inference path with
    ``state``'s parameters closed over (baked into the export as constants).

    mode="sample":  fn(seed: uint32[]) -> images float32 [n, H, W, C]
                    (glow-eeg: signals [n, C, 1, T])
    mode="denoise": fn(x: float32 [n, H, W, C] in [-1, 1], seed: uint32[])
                    -> reconstruction float32 [n, H, W, C]
                    (vae / vaegan encoder->decoder, main_vae.py:258-260)

    ``poly_batch`` (denoise only): export with a SYMBOLIC batch dimension
    (jax.export shape polymorphism) — one artifact then serves any request
    batch size with no client-side padding/tiling. Sample-mode exports are
    inherently fixed-``n`` (the batch is created inside the program from the
    seed alone), so poly_batch is rejected there.
    """
    seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)

    if mode == "denoise":
        if family not in ("vae", "vaegan"):
            raise ValueError(f"denoise export supports vae/vaegan, "
                             f"not {family!r}")
        from vgd_tpu.models.vae import latent_to_spatial, reparameterize
        img_shape = trainer.img_shape

        def fn(x, seed):
            (mu, logvar) = trainer.encoder.apply(
                state.encoder.variables(), x, train=False)
            z, _ = reparameterize(_key(seed), mu, logvar)
            return trainer.decoder.apply(
                state.decoder.variables(), latent_to_spatial(z),
                train=False).astype(jnp.float32)

        if poly_batch:
            b, = jax_export.symbolic_shape("b")
            x_spec = jax.ShapeDtypeStruct((b,) + tuple(img_shape),
                                          jnp.float32)
        else:
            x_spec = jax.ShapeDtypeStruct((n,) + tuple(img_shape),
                                          jnp.float32)
        return fn, (x_spec, seed_spec)

    if poly_batch:
        raise ValueError("poly_batch applies to denoise exports only: a "
                         "sample-mode program creates its batch internally "
                         "from the seed, so its size is baked at export")

    if mode != "sample":
        raise ValueError(f"unknown export mode {mode!r}")

    if family in ("vaegan", "vae"):
        def fn(seed):
            z = jax.random.normal(_key(seed), (n, cfg.latent_dim))
            return trainer.generate(state, z).astype(jnp.float32)
    elif family in ("gan", "wgan"):
        def fn(seed):
            z = jax.random.normal(_key(seed), (n, 1, 1, cfg.latent_dim))
            return trainer.generate(state, z).astype(jnp.float32)
    elif family == "glow":
        def fn(seed):
            z = trainer.sample_z(_key(seed), n)
            # reverse returns [-0.5, 0.5]-scaled images (nf_code.py:613-621
            # counterpart); x2 restores signed range, as sample_from_dir
            return (trainer.reverse(state, z) * 2.0).astype(jnp.float32)
    elif family == "glow-eeg":
        def fn(seed):
            z = trainer.sample_z(_key(seed), n)
            return trainer.reverse(state, z).astype(jnp.float32)
    elif family == "diffusion":
        img_shape = trainer.img_shape

        def fn(seed):
            key = _key(seed)
            if ddim_steps > 0:
                return trainer.generate_ddim(
                    state, (n,) + tuple(img_shape), key, ddim_steps,
                    eta=ddim_eta).astype(jnp.float32)
            return trainer.generate(
                state, (n,) + tuple(img_shape), key).astype(jnp.float32)
    else:
        raise ValueError(f"unknown family {family!r}")
    return fn, (seed_spec,)


def export_artifact(fn: Callable, example_args, path: str,
                    platforms: Tuple[str, ...] = ("tpu", "cpu"),
                    meta: Optional[dict] = None) -> dict:
    """Trace+lower ``fn`` for every platform, serialize, write sidecar.
    Returns the sidecar dict."""
    exported = jax_export.export(jax.jit(fn),
                                 platforms=list(platforms))(*example_args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    side = dict(meta or {})
    side.update(
        format_version=FORMAT_VERSION,
        platforms=list(exported.platforms),
        in_avals=[str(a) for a in exported.in_avals],
        out_avals=[str(a) for a in exported.out_avals],
        nbytes=len(blob),
    )
    with open(path + ".json", "w") as f:
        json.dump(side, f, indent=1, default=str)
    return side


def load_artifact(path: str) -> Tuple[Callable, dict]:
    """Deserialize an artifact; returns ``(call, meta)``. The callable takes
    the exact arguments the export was built with (``meta['in_avals']``
    documents them).

    The artifact is self-contained: the .json sidecar is optional
    convenience. When it is present its ``format_version`` is validated;
    whether or not it is present, the call convention (``mode``) and batch
    size ``n`` are recovered from the exported program's own input avals —
    a denoise export takes (x[n,H,W,C], seed), a sample export (seed,) —
    so a sidecar-less denoise artifact still runs correctly instead of
    failing with an opaque arity error (ADVICE r4)."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
        fv = meta.get("format_version")
        if fv is not None and int(fv) > FORMAT_VERSION:
            raise ValueError(
                f"{path}: artifact format_version {fv} is newer than this "
                f"loader's {FORMAT_VERSION} — upgrade vgd_tpu to run it")
    in_avals = list(exported.in_avals)
    meta.setdefault("mode", "denoise" if len(in_avals) == 2 else "sample")
    if len(in_avals) == 2 and getattr(in_avals[0], "shape", None):
        b0 = in_avals[0].shape[0]
        if isinstance(b0, int):
            meta.setdefault("n", b0)
        else:                         # symbolic batch (poly_batch export)
            meta.setdefault("poly_batch", True)
    meta.setdefault("in_avals", [str(a) for a in in_avals])
    return exported.call, meta


def export_serving(family: str, cfg, n: int = 64, mode: str = "sample",
                   step: Optional[int] = None, ddim_steps: int = 0,
                   ddim_eta: float = 0.0,
                   platforms: Tuple[str, ...] = ("tpu", "cpu"),
                   artifact_path: Optional[str] = None, seed: int = 0,
                   poly_batch: bool = False) -> str:
    """Restore ``family``'s latest (or ``step``) checkpoint under
    ``cfg.run.out_dir`` and export its serving program. Returns the
    artifact path."""
    from vgd_tpu.core.rng import seed_all
    from vgd_tpu.io.checkpoint import Checkpointer

    key = seed_all(seed)
    od = cfg.run.out_dir
    if family in ("vaegan", "vae", "gan", "wgan", "glow", "diffusion"):
        img_shape = tuple(cfg.data.image_size) + (3,)
        if family == "vaegan":
            from vgd_tpu.train.vaegan import VAEGANTrainer as T
        elif family == "vae":
            from vgd_tpu.train.vae import VAETrainer as T
        elif family in ("gan", "wgan"):
            from vgd_tpu.train.gan import GANTrainer as T
        elif family == "glow":
            from vgd_tpu.train.glow import GlowTrainer as T
        else:
            from vgd_tpu.train.diffusion import DiffusionTrainer as T
        trainer = T(cfg, img_shape)
        ckpt_dir = os.path.join(od, "ckpt")
        batch = getattr(cfg.data, "batch_size", 16)
    elif family == "glow-eeg":
        from vgd_tpu.train.glow import GlowEEGTrainer
        trainer = GlowEEGTrainer(cfg)
        ckpt_dir = os.path.join(od, f"ckpt_{cfg.event_type}")
        batch = cfg.batch_size
    else:
        raise ValueError(f"unknown family {family!r}")

    template = trainer.init(key, batch)
    state, _, restored_step = Checkpointer(ckpt_dir).restore(template,
                                                             step=step)
    fn, example_args = build_serving_fn(family, cfg, trainer, state, n,
                                        mode=mode, ddim_steps=ddim_steps,
                                        ddim_eta=ddim_eta,
                                        poly_batch=poly_batch)
    artifact_path = artifact_path or os.path.join(
        od, f"serving_{family}_{mode}.jaxexport")
    meta = dict(family=family, mode=mode, n=n, step=int(restored_step),
                ddim_steps=ddim_steps, ddim_eta=ddim_eta,
                poly_batch=poly_batch,
                config=dataclasses.asdict(cfg))
    export_artifact(fn, example_args, artifact_path,
                    platforms=platforms, meta=meta)
    print(f"[export] {family}/{mode} step {restored_step} -> "
          f"{artifact_path} ({os.path.getsize(artifact_path)} bytes, "
          f"platforms {list(platforms)})")
    return artifact_path


def run_artifact(artifact_path: Optional[str] = None, seed: int = 0,
                 inputs: Optional[np.ndarray] = None,
                 loaded: Optional[Tuple[Callable, dict]] = None) -> np.ndarray:
    """Execute one serving call — the serving hot path. ``inputs`` is
    required for denoise-mode artifacts.

    ``loaded``: an already-deserialized ``(call, meta)`` pair from
    ``load_artifact`` — callers that loaded the artifact for its metadata
    (e.g. the CLI's infer) pass it here instead of paying a second read +
    StableHLO deserialization of the same file (ADVICE r4)."""
    call, meta = loaded if loaded is not None else load_artifact(artifact_path)
    if meta.get("mode") == "denoise":
        if inputs is None:
            raise ValueError("denoise artifact needs `inputs`")
        out = call(jnp.asarray(inputs, jnp.float32), jnp.uint32(seed))
    else:
        out = call(jnp.uint32(seed))
    return np.asarray(out)
