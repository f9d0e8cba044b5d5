"""Loop-level smoke tests: every run_* driver, the eval entry points, and the
CLI dispatch, at tiny scale on CPU (SURVEY.md §4 extended to the loop layer —
the --resume bug of round 1 lived exactly here).

Each test runs the REAL production code path (loops, checkpointing,
artifacts, resume) with synthetic data and asserts: finite metrics, artifact
files on disk, and resumability.
"""
import glob
import json
import os

import numpy as np
import pytest

from vgd_tpu import cli
from vgd_tpu.core.config import (DataConfig, DiffusionConfig, GANConfig,
                                 GlowConfig, GlowEEGConfig, RunConfig,
                                 VAEConfig, VAEGANConfig)
from vgd_tpu.train import loop as L


def _finite_rows(rows):
    for row in rows:
        for k, v in row.items():
            assert np.isfinite(v), (k, row)


# ---------------------------------------------------------------------------
# VAE-GAN driver + resume
# ---------------------------------------------------------------------------

def test_run_vaegan_smoke_and_resume(tmp_path):
    cfg = VAEGANConfig(
        data=DataConfig(image_size=(64, 64), batch_size=4, dataset_size=16),
        run=RunConfig(out_dir=str(tmp_path), compute_dtype="float32"),
        epochs=1)
    out = L.run_vaegan(cfg, max_steps_per_epoch=2, epoch_scan=False)
    _finite_rows(out["log"])
    assert os.path.exists(tmp_path / "loss.jsonl")
    assert os.path.exists(tmp_path / "losses.jpg")
    assert glob.glob(str(tmp_path / "vaegan_fake_epoch_*.jpg"))
    assert glob.glob(str(tmp_path / "vaegan_decode_epoch_*.jpg"))
    assert os.path.isdir(tmp_path / "ckpt")

    # resume: epoch 0 checkpoint exists -> a 2-epoch resumed run does ONLY
    # epoch 1 (one new log row)
    out2 = L.run_vaegan(cfg, epochs=2, max_steps_per_epoch=2,
                        epoch_scan=False, resume=True)
    assert len(out2["log"]) == 1
    assert out2["log"][0]["epoch"] == 1


def test_run_vaegan_streaming_epoch_scan(tmp_path, monkeypatch):
    """The scan path streams fixed-size chunks (no whole-epoch host stack):
    force 1-step chunks so one epoch = several compiled scans + staging."""
    monkeypatch.setattr(L, "SCAN_CHUNK_BYTES", 1)   # -> chunk_steps == 1
    cfg = VAEGANConfig(
        data=DataConfig(image_size=(64, 64), batch_size=4, dataset_size=16),
        run=RunConfig(out_dir=str(tmp_path), compute_dtype="float32"),
        epochs=1)
    out = L.run_vaegan(cfg, max_steps_per_epoch=3, epoch_scan=True)
    _finite_rows(out["log"])
    row = out["log"][0]
    assert row["train_recon"] > 0 and np.isfinite(row["train_recon"])


# ---------------------------------------------------------------------------
# VAE driver with occlusion + both eval paths + sample, via the CLI
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vae_run_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vae_run"))
    rc = cli.main(["vae", "--epochs", "1", "--steps-per-epoch", "2",
                   "--batch-size", "4", "--dataset-size", "16",
                   "--out-dir", d, "--occlusion",
                   "--compute-dtype", "float32"])
    assert rc == 0
    return d


def test_vae_cli_train_artifacts(vae_run_dir):
    assert os.path.exists(os.path.join(vae_run_dir, "vae_loss.jsonl"))
    rows = [json.loads(ln) for ln in
            open(os.path.join(vae_run_dir, "vae_loss.jsonl"))]
    _finite_rows(rows)
    assert glob.glob(os.path.join(vae_run_dir, "vae_fake_epoch_*.jpg"))
    assert os.path.isdir(os.path.join(vae_run_dir, "ckpt"))


def test_eval_vae_occlusion_cli(vae_run_dir):
    rc = cli.main(["eval-vae", "--occlusion", "--out-dir", vae_run_dir,
                   "--batch-size", "4", "--dataset-size", "16",
                   "--max-batches", "1"])
    assert rc == 0
    for f in ("occlusion_metrics.npz", "occlusion_triplets.jpg",
              "occlusion_renoise_cycles.jpg", "occlusion_traversal_mu.jpg",
              "occlusion_traversal_logvar.jpg"):
        assert os.path.exists(os.path.join(vae_run_dir, f)), f
    m = np.load(os.path.join(vae_run_dir, "occlusion_metrics.npz"))
    for k in ("test_loss", "mse", "psnr", "ssim"):
        assert np.isfinite(float(m[k])), k


def test_eval_vae_aggregated_posterior_cli(vae_run_dir):
    rc = cli.main(["eval-vae", "--out-dir", vae_run_dir,
                   "--batch-size", "4", "--dataset-size", "16",
                   "--max-checkpoints", "1", "--max-batches", "1"])
    assert rc == 0
    assert os.path.exists(os.path.join(vae_run_dir, "vae_eval_metrics.npz"))
    assert glob.glob(os.path.join(vae_run_dir, "vae_aggpost_step_*.jpg"))


def test_eval_vae_occlusion_composes_with_sweep(vae_run_dir, capsys):
    """--fid --occlusion must run BOTH the occlusion analysis and the
    aggregated-posterior checkpoint sweep (VERDICT r4 item 4: the flags
    used to be an if/else and --occlusion silently dropped the sweep)."""
    for f in ("occlusion_metrics.npz", "vae_eval_metrics.npz"):
        p = os.path.join(vae_run_dir, f)
        if os.path.exists(p):
            os.remove(p)
    rc = cli.main(["eval-vae", "--fid", "--occlusion",
                   "--out-dir", vae_run_dir,
                   "--batch-size", "4", "--dataset-size", "16",
                   "--max-checkpoints", "1", "--max-batches", "1"])
    assert rc == 0
    assert os.path.exists(os.path.join(vae_run_dir, "occlusion_metrics.npz"))
    assert os.path.exists(os.path.join(vae_run_dir, "vae_eval_metrics.npz"))
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "occlusion" in out and "sweep" in out


def test_sample_vae_cli(vae_run_dir):
    out = os.path.join(vae_run_dir, "samples.jpg")
    rc = cli.main(["sample", "--family", "vae", "--out-dir", vae_run_dir,
                   "--batch-size", "4", "--dataset-size", "16",
                   "-n", "4", "--out", out])
    assert rc == 0
    assert os.path.exists(out)


def test_aggregated_posterior_sweep_api(vae_run_dir):
    """Direct API path with IS/FID enabled via the random-init surrogate."""
    cfg = VAEConfig(
        data=DataConfig(image_size=(64, 64), batch_size=4, dataset_size=16,
                        noise_max_std=0.5, occlusion=False),
        run=RunConfig(out_dir=vae_run_dir, compute_dtype="float32"))
    feature_fn, tag = L.load_feature_fn(True)
    assert tag == "random-init"
    res = L.evaluate_vae_checkpoints(cfg, feature_fn=feature_fn,
                                     max_checkpoints=1,
                                     max_encode_batches=2,
                                     max_eval_batches=2)
    assert len(res) == 1
    assert np.isfinite(res[0]["ssim"])
    # random-init weights => metrics carry the _surrogate suffix, and IS
    # (identically ~1.0 under random logits) is dropped (VERDICT r4 item 5)
    assert np.isfinite(res[0]["fid_surrogate"]) and res[0]["fid_surrogate"] >= 0
    assert "fid" not in res[0] and "inception_score" not in res[0]


# ---------------------------------------------------------------------------
# GAN / WGAN drivers + checkpoint-sweep eval via the CLI
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def gan_run_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("gan_run"))
    rc = cli.main(["gan", "--epochs", "1", "--steps-per-epoch", "2",
                   "--batch-size", "4", "--dataset-size", "16",
                   "--out-dir", d, "--compute-dtype", "float32"])
    assert rc == 0
    return d


def test_gan_cli_train_artifacts(gan_run_dir):
    rows = [json.loads(ln) for ln in
            open(os.path.join(gan_run_dir, "gan_loss.jsonl"))]
    _finite_rows(rows)
    assert glob.glob(os.path.join(gan_run_dir, "gan_fake_epoch_*.jpg"))


def test_eval_gan_cli(gan_run_dir, capsys):
    rc = cli.main(["eval-gan", "--out-dir", gan_run_dir,
                   "--batch-size", "4", "--dataset-size", "16",
                   "--max-checkpoints", "1"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(res) == 1 and np.isfinite(res[0]["ssim"])
    assert os.path.exists(os.path.join(gan_run_dir, "metrics.npz"))


def test_run_wgan_smoke(tmp_path):
    cfg = GANConfig(
        data=DataConfig(image_size=(64, 64), batch_size=4, dataset_size=16),
        run=RunConfig(out_dir=str(tmp_path), compute_dtype="float32"),
        wgan=True, epochs=1)
    out = L.run_gan(cfg, max_steps_per_epoch=1)
    _finite_rows(out["log"])
    assert glob.glob(str(tmp_path / "gan_fake_epoch_*.jpg"))


# ---------------------------------------------------------------------------
# Glow image driver + eval + sample
# ---------------------------------------------------------------------------

def test_run_glow_smoke_eval_sample(tmp_path):
    cfg = GlowConfig(
        data=DataConfig(image_size=(16, 16), batch_size=4, dataset_size=16,
                        normalize=False),
        run=RunConfig(out_dir=str(tmp_path), compute_dtype="float32",
                      sample_every_iters=2, checkpoint_every_iters=2),
        n_flows=2, n_blocks=2, filter_size=8, n_iter=2, n_samples=4)
    out = L.run_glow(cfg)
    _finite_rows(out["log"])
    assert glob.glob(str(tmp_path / "sample" / "*.png"))

    res = L.evaluate_glow_from_dir(cfg, max_batches=1)
    assert np.isfinite(res["ssim"])
    assert os.path.exists(tmp_path / "glow_eval_metrics.npz")

    path = L.sample_from_dir("glow", cfg, n=4,
                             out_path=str(tmp_path / "glow_samples.jpg"))
    assert os.path.exists(path)


# ---------------------------------------------------------------------------
# Glow EEG driver
# ---------------------------------------------------------------------------

def test_run_glow_eeg_smoke(tmp_path):
    cfg = GlowEEGConfig(
        run=RunConfig(out_dir=str(tmp_path), compute_dtype="float32",
                      sample_every_iters=2, checkpoint_every_iters=2),
        n_flows=2, n_blocks=2, filter_size=8, n_iter=2, batch_size=4,
        n_samples=2)
    out = L.run_glow_eeg(cfg)
    _finite_rows(out["log"])
    assert glob.glob(str(tmp_path / "sample" / "fake_eeg_mi_*.npz"))
    assert glob.glob(str(tmp_path / "sample" / "fake_eeg_mi_*.png"))
    # post-training PSD comparison + training-evolution GIF
    # (test_eegglow.py:12-46)
    assert os.path.exists(tmp_path / "psd_comparison_mi.jpg")
    assert os.path.exists(tmp_path / "training_evolution_mi.gif")

    # standalone driver via the CLI (restores the checkpoint)
    rc = cli.main(["eval-eeg", "--out-dir", str(tmp_path), "--n-fake", "8",
                   "--flows", "2", "--blocks", "2", "--filter-size", "8",
                   "--batch-size", "4"])
    assert rc == 0


# ---------------------------------------------------------------------------
# Diffusion driver + restoration eval + sample
# ---------------------------------------------------------------------------

def test_run_diffusion_smoke_eval_sample(tmp_path):
    cfg = DiffusionConfig(
        data=DataConfig(image_size=(32, 32), batch_size=4, dataset_size=16),
        run=RunConfig(out_dir=str(tmp_path), compute_dtype="float32"),
        epochs=1, timesteps=10, base_ch=8, time_emb_dim=32, attention=False)
    out = L.run_diffusion(cfg, max_steps_per_epoch=2)
    _finite_rows(out["log"])

    res = L.evaluate_diffusion_from_dir(cfg, max_batches=1)
    assert np.isfinite(res["ssim"]) and np.isfinite(res["psnr"])
    assert os.path.exists(tmp_path / "diffusion_restore_panel.jpg")

    path = L.sample_from_dir(
        "diffusion", cfg, n=4,
        out_path=str(tmp_path / "diffusion_samples.jpg"))
    assert os.path.exists(path)


def test_run_vaegan_data_parallel_loop(tmp_path):
    """With 8 visible devices and a batch divisible by the data axis, the
    production loop shards batches over the mesh (RunConfig.mesh) and keeps
    params replicated — exercised here on the virtual CPU mesh through BOTH
    the streaming-scan and the prefetch paths."""
    import jax
    assert jax.device_count() == 8
    cfg = VAEGANConfig(
        data=DataConfig(image_size=(64, 64), batch_size=8, dataset_size=24),
        run=RunConfig(out_dir=str(tmp_path), compute_dtype="float32"),
        epochs=1)
    out = L.run_vaegan(cfg, max_steps_per_epoch=2, epoch_scan=True)
    _finite_rows(out["log"])
    leaf = jax.tree_util.tree_leaves(out["state"].encoder.params)[0]
    assert leaf.sharding.is_fully_replicated

    cfg2 = VAEGANConfig(
        data=DataConfig(image_size=(64, 64), batch_size=8, dataset_size=24),
        run=RunConfig(out_dir=str(tmp_path / "p"), compute_dtype="float32"),
        epochs=1)
    out2 = L.run_vaegan(cfg2, max_steps_per_epoch=2, epoch_scan=False)
    _finite_rows(out2["log"])


def test_run_glow_data_parallel_loop(tmp_path):
    import jax
    cfg = GlowConfig(
        data=DataConfig(image_size=(16, 16), batch_size=8, dataset_size=16,
                        normalize=False),
        run=RunConfig(out_dir=str(tmp_path), compute_dtype="float32",
                      sample_every_iters=2, checkpoint_every_iters=2),
        n_flows=2, n_blocks=2, filter_size=8, n_iter=2)
    out = L.run_glow(cfg, n_iter=2)
    _finite_rows(out["log"])
    leaf = jax.tree_util.tree_leaves(out["state"].params)[0]
    assert leaf.sharding.is_fully_replicated


def test_cli_wgan_defaults_reference_epochs(monkeypatch):
    """`wgan` without --epochs uses the reference's 1500 (gan_code.py:288);
    `gan` keeps 150; explicit --epochs wins."""
    from vgd_tpu import cli
    from vgd_tpu.train import loop as L
    seen = {}
    monkeypatch.setattr(L, "run_gan",
                        lambda cfg, **kw: seen.update(cfg=cfg))
    cli.main(["wgan"])
    assert seen["cfg"].epochs == 1500 and seen["cfg"].wgan
    cli.main(["gan"])
    assert seen["cfg"].epochs == 150 and not seen["cfg"].wgan
    cli.main(["wgan", "--epochs", "7"])
    assert seen["cfg"].epochs == 7


def test_cli_device_flag(tmp_path):
    """--device cpu forces the platform via the config API before backend
    use; in-process it is a no-op re-pin of the conftest's cpu platform,
    so the run must succeed identically (the flag exists so CLI
    subprocesses can run accelerator-free — benchmarks/soak_resume.py)."""
    d = str(tmp_path / "dev")
    rc = cli.main(["vae", "--epochs", "1", "--steps-per-epoch", "1",
                   "--batch-size", "4", "--dataset-size", "8",
                   "--out-dir", d, "--device", "cpu",
                   "--compute-dtype", "float32"])
    assert rc == 0
    import jax
    assert jax.default_backend() == "cpu"


def test_profiler_traces_epoch_scan_path(tmp_path):
    """--profile-dir must produce a trace on the DEFAULT flagship path (the
    streaming epoch scan): the profiler traces whole compiled chunks that
    overlap the configured step window (SURVEY.md §5 tracing)."""
    prof_dir = tmp_path / "trace"
    cfg = VAEGANConfig(
        data=DataConfig(image_size=(64, 64), batch_size=4, dataset_size=8),
        run=RunConfig(out_dir=str(tmp_path), compute_dtype="float32",
                      profile_dir=str(prof_dir), profile_steps=(0, 1)),
        epochs=1)
    L.run_vaegan(cfg, epoch_scan=True)
    files = [f for f in glob.glob(str(prof_dir / "**" / "*"), recursive=True)
             if os.path.isfile(f)]
    assert files, "profiled epoch-scan run produced no trace files"


def test_mesh_model_axis_rejected_without_consumer():
    """mesh.model > 1 for families with no model-axis consumer (vaegan/vae/
    gan) is a loud config error, not silent compute duplication."""
    from vgd_tpu.core.config import MeshConfig
    r = RunConfig(mesh=MeshConfig(model=2))
    with pytest.raises(ValueError, match="mesh-model"):
        L._dp_mesh(r, 64)
    # the consuming families still get their DP x model mesh
    mesh = L._dp_mesh(r, 64, model_consumer="tp")
    assert mesh is not None and mesh.shape["model"] == 2


def test_run_vaegan_rejects_model_axis(tmp_path):
    from vgd_tpu.core.config import MeshConfig
    cfg = VAEGANConfig(
        data=DataConfig(image_size=(64, 64), batch_size=8, dataset_size=8),
        run=RunConfig(out_dir=str(tmp_path), compute_dtype="float32",
                      mesh=MeshConfig(model=2)),
        epochs=1)
    with pytest.raises(ValueError, match="mesh-model"):
        L.run_vaegan(cfg)
