"""AOT serving export (io/export.py): the compiled-artifact deployment path.

The reference has no serving story (interactive sampler loops only, e.g.
main_vae.py:348-413); these tests pin the TPU-native one: a trained
checkpoint exports to a self-contained StableHLO artifact (params baked in)
that reloads WITHOUT model code and reproduces the in-process inference
path exactly.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgd_tpu import cli
from vgd_tpu.core.config import DataConfig, RunConfig, VAEConfig
from vgd_tpu.core.rng import seed_all
from vgd_tpu.io.checkpoint import Checkpointer
from vgd_tpu.io.export import (build_serving_fn, export_serving,
                               load_artifact, run_artifact)
from vgd_tpu.train import loop as L
from vgd_tpu.train.vae import VAETrainer


@pytest.fixture(scope="module")
def vae_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("export_vae")
    cfg = VAEConfig(
        data=DataConfig(image_size=(64, 64), batch_size=4, dataset_size=16),
        run=RunConfig(out_dir=str(out), compute_dtype="float32"),
        epochs=1)
    L.run_vae(cfg, max_steps_per_epoch=2, epoch_scan=False)
    return cfg


def _restored(cfg):
    trainer = VAETrainer(cfg, tuple(cfg.data.image_size) + (3,))
    template = trainer.init(seed_all(0), 4)
    state, _, _ = Checkpointer(
        os.path.join(cfg.run.out_dir, "ckpt")).restore(template)
    return trainer, state


def test_export_sample_roundtrip_matches_direct(vae_dir):
    cfg = vae_dir
    path = export_serving("vae", cfg, n=4, platforms=("cpu",),
                          artifact_path=os.path.join(cfg.run.out_dir,
                                                     "art.jaxexport"))
    assert os.path.exists(path) and os.path.exists(path + ".json")

    call, meta = load_artifact(path)
    assert meta["family"] == "vae" and meta["mode"] == "sample"
    out = np.asarray(call(jnp.uint32(7)))
    assert out.shape == (4, 64, 64, 3) and np.isfinite(out).all()
    # deterministic per seed, distinct across seeds
    np.testing.assert_array_equal(out, np.asarray(call(jnp.uint32(7))))
    assert not np.array_equal(out, np.asarray(call(jnp.uint32(8))))

    # parity with the in-process inference path (same params, same seed)
    trainer, state = _restored(cfg)
    fn, _ = build_serving_fn("vae", cfg, trainer, state, 4)
    np.testing.assert_allclose(out, np.asarray(fn(jnp.uint32(7))),
                               rtol=0, atol=1e-5)


def test_export_denoise_mode(vae_dir):
    cfg = vae_dir
    path = export_serving("vae", cfg, n=2, mode="denoise",
                          platforms=("cpu",),
                          artifact_path=os.path.join(cfg.run.out_dir,
                                                     "den.jaxexport"))
    x = np.clip(np.random.default_rng(0).normal(0, 0.3, (2, 64, 64, 3)),
                -1, 1).astype(np.float32)
    out = run_artifact(path, seed=3, inputs=x)
    assert out.shape == x.shape and np.isfinite(out).all()

    trainer, state = _restored(cfg)
    fn, _ = build_serving_fn("vae", cfg, trainer, state, 2, mode="denoise")
    np.testing.assert_allclose(out, np.asarray(fn(jnp.asarray(x),
                                                  jnp.uint32(3))),
                               rtol=0, atol=1e-5)


def test_export_infer_cli(vae_dir, tmp_path):
    cfg = vae_dir
    art = str(tmp_path / "cli.jaxexport")
    assert cli.main(["export", "--family", "vae", "--out-dir",
                     cfg.run.out_dir, "--image-size", "64",
                     "-n", "4", "--platforms", "cpu",
                     "--artifact", art]) == 0
    grid = str(tmp_path / "grid.jpg")
    assert cli.main(["infer", "--artifact", art, "--seed", "5",
                     "--out", grid]) == 0
    assert os.path.exists(grid)


def test_artifact_self_contained_without_sidecar(vae_dir, tmp_path):
    """The .json sidecar is optional: a denoise artifact with no sidecar must
    still be detected as denoise (from the exported program's own input
    avals) and run — not fail with an opaque arity error (ADVICE r4)."""
    cfg = vae_dir
    path = export_serving("vae", cfg, n=2, mode="denoise",
                          platforms=("cpu",),
                          artifact_path=str(tmp_path / "bare.jaxexport"))
    os.remove(path + ".json")
    call, meta = load_artifact(path)
    assert meta["mode"] == "denoise" and meta["n"] == 2
    x = np.zeros((2, 64, 64, 3), np.float32)
    out = run_artifact(path, seed=1, inputs=x)
    assert out.shape == x.shape and np.isfinite(out).all()
    # and the pre-loaded fast path matches
    out2 = run_artifact(seed=1, inputs=x, loaded=(call, meta))
    np.testing.assert_array_equal(out, out2)


def test_artifact_rejects_newer_format_version(vae_dir, tmp_path):
    import json as _json
    cfg = vae_dir
    path = export_serving("vae", cfg, n=2, platforms=("cpu",),
                          artifact_path=str(tmp_path / "ver.jaxexport"))
    side = _json.load(open(path + ".json"))
    side["format_version"] = 999
    _json.dump(side, open(path + ".json", "w"))
    with pytest.raises(ValueError, match="format_version"):
        load_artifact(path)


def test_infer_cli_single_image_npy_and_oversize_batch(vae_dir, tmp_path,
                                                       capsys):
    """3-D [H,W,C] .npy input must be treated as a batch of one (it used to
    crash in np.tile); a batch larger than the exported n must warn about
    truncation (ADVICE r4)."""
    cfg = vae_dir
    art = str(tmp_path / "den3.jaxexport")
    assert cli.main(["export", "--family", "vae", "--mode", "denoise",
                     "--out-dir", cfg.run.out_dir, "--image-size", "64",
                     "-n", "2", "--platforms", "cpu",
                     "--artifact", art]) == 0
    single = str(tmp_path / "one.npy")
    np.save(single, np.zeros((64, 64, 3), np.float32))
    out_img = str(tmp_path / "one_out.jpg")
    assert cli.main(["infer", "--artifact", art, "--input", single,
                     "--out", out_img]) == 0
    assert os.path.exists(out_img)
    big = str(tmp_path / "big.npy")
    np.save(big, np.zeros((5, 64, 64, 3), np.float32))
    assert cli.main(["infer", "--artifact", art, "--input", big,
                     "--out", str(tmp_path / "big_out.jpg")]) == 0
    assert "only the first 2 rows" in capsys.readouterr().out


@pytest.mark.skipif(os.environ.get("VGD_SKIP_POLY") == "1",
                    reason="poly-batch validation skipped by request")
def test_poly_batch_denoise_serves_any_batch_size(vae_dir, tmp_path):
    """--poly-batch exports the denoiser with a SYMBOLIC batch dimension
    (jax.export shape polymorphism): one artifact serves batch 1, 3, and 7
    with no client-side padding/tiling, and each row matches the static
    export's output for the same seed."""
    cfg = vae_dir
    path = export_serving("vae", cfg, n=2, mode="denoise",
                          platforms=("cpu",), poly_batch=True,
                          artifact_path=str(tmp_path / "poly.jaxexport"))
    call, meta = load_artifact(path)
    assert meta["poly_batch"] is True
    rng = np.random.default_rng(0)
    for b in (1, 3, 7):
        x = np.clip(rng.normal(0, 0.3, (b, 64, 64, 3)), -1, 1).astype(
            np.float32)
        out = run_artifact(seed=3, inputs=x, loaded=(call, meta))
        assert out.shape == x.shape and np.isfinite(out).all()
    # sidecar-less polymorphic artifact still self-describes
    os.remove(path + ".json")
    _, meta2 = load_artifact(path)
    assert meta2["mode"] == "denoise" and meta2.get("poly_batch") is True


def test_poly_batch_rejected_for_sample_mode(vae_dir):
    cfg = vae_dir
    trainer, state = _restored(cfg)
    with pytest.raises(ValueError, match="poly_batch"):
        build_serving_fn("vae", cfg, trainer, state, 2, mode="sample",
                         poly_batch=True)


def test_export_rejects_bad_mode(vae_dir):
    cfg = vae_dir
    trainer, state = _restored(cfg)
    with pytest.raises(ValueError):
        build_serving_fn("gan", cfg, trainer, state, 2, mode="denoise")
    with pytest.raises(ValueError):
        build_serving_fn("vae", cfg, trainer, state, 2, mode="nope")
