"""Metric tests: SSIM/PSNR/MSE properties + golden values, FID/IS statistics
on controlled feature distributions (SURVEY.md §4: 'metric tests pinning
FID/IS/SSIM implementations against known fixtures')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgd_tpu.eval.metrics import (MetricAccumulator, frechet_distance,
                                  inception_score_from_logits, mse_metric,
                                  psnr, ssim)

KEY = jax.random.key(0)


def test_ssim_identity_is_one():
    x = jax.random.uniform(KEY, (2, 32, 32, 3))
    np.testing.assert_allclose(float(ssim(x, x)), 1.0, atol=1e-5)


def test_ssim_decreases_with_noise():
    x = jax.random.uniform(KEY, (2, 32, 32, 3))
    small = jnp.clip(x + 0.05 * jax.random.normal(KEY, x.shape), 0, 1)
    large = jnp.clip(x + 0.5 * jax.random.normal(KEY, x.shape), 0, 1)
    s_small, s_large = float(ssim(small, x)), float(ssim(large, x))
    assert 0 < s_large < s_small < 1.0


def test_ssim_matches_independent_numpy_reference():
    """Cross-check against a direct (uniform-window-free) per-window numpy
    evaluation of the SSIM definition with the same gaussian kernel."""
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (1, 16, 16, 1)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))

    # independent direct evaluation
    size, sigma = 11, 1.5
    coords = np.arange(size) - (size - 1) / 2
    g = np.exp(-coords**2 / (2 * sigma**2))
    g /= g.sum()
    k = np.outer(g, g)
    A, B = a[0, :, :, 0], b[0, :, :, 0]
    c1, c2 = 0.01**2, 0.03**2
    vals = []
    for i in range(16 - size + 1):
        for j in range(16 - size + 1):
            wa = A[i:i + size, j:j + size]
            wb = B[i:i + size, j:j + size]
            mua, mub = (k * wa).sum(), (k * wb).sum()
            va = (k * wa * wa).sum() - mua**2
            vb = (k * wb * wb).sum() - mub**2
            cov = (k * wa * wb).sum() - mua * mub
            vals.append(((2 * mua * mub + c1) * (2 * cov + c2)) /
                        ((mua**2 + mub**2 + c1) * (va + vb + c2)))
    np.testing.assert_allclose(ours, np.mean(vals), rtol=1e-4)


def test_psnr_golden_value():
    x = jnp.zeros((1, 8, 8, 1))
    y = jnp.full((1, 8, 8, 1), 0.1)
    # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20 dB
    np.testing.assert_allclose(float(psnr(y, x)), 20.0, rtol=1e-5)
    assert float(mse_metric(y, x)) == pytest.approx(0.01, rel=1e-5)


def test_frechet_distance_properties():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (2000, 8))
    b = rng.normal(0, 1, (2000, 8))
    same = frechet_distance(a, a)
    close = frechet_distance(a, b)
    shifted = frechet_distance(a, b + 3.0)
    assert same == pytest.approx(0.0, abs=1e-6)
    assert close < 0.1
    # mean shift of 3 in 8 dims -> ||diff||^2 ~ 72
    assert shifted == pytest.approx(72.0, rel=0.1)


def test_inception_score_uniform_vs_confident():
    n, c = 500, 10
    rng = np.random.default_rng(0)
    uniform_logits = np.zeros((n, c))
    is_u, _ = inception_score_from_logits(uniform_logits)
    assert is_u == pytest.approx(1.0, abs=1e-5)  # no information -> IS = 1
    confident = np.full((n, c), -20.0)
    confident[np.arange(n), rng.integers(0, c, n)] = 20.0
    is_c, _ = inception_score_from_logits(confident)
    assert is_c > 5.0   # diverse + confident -> IS near num classes


def test_metric_accumulator_with_synthetic_features():
    """End-to-end accumulator with a stub feature extractor."""
    rng = np.random.default_rng(0)

    def fake_features(x_uint8):
        flat = x_uint8.reshape(len(x_uint8), -1).astype(np.float32) / 255.0
        feats = flat[:, :16]
        logits = flat[:, :10]
        return feats, logits

    acc = MetricAccumulator(feature_fn=fake_features)
    for _ in range(3):
        real = jnp.asarray(rng.uniform(0, 1, (8, 16, 16, 3)), jnp.float32)
        fake = jnp.clip(real + 0.2 * rng.normal(0, 1, real.shape)
                        .astype(np.float32), 0, 1)
        acc.update(fake, real)
    out = acc.compute()
    assert 0 < out["ssim"] < 1
    assert out["fid"] >= 0 and np.isfinite(out["fid"])
    assert out["inception_score"] >= 1.0


def test_metric_accumulator_surrogate_weight_tagging():
    """With random-init Inception weights (weights_tag='random-init'), the
    feature-based metrics must carry a _surrogate suffix and IS must be
    dropped (identically ~1.0 under random logits) — VERDICT r4 item 5:
    no logged row may be misread as real-Inception quality."""
    rng = np.random.default_rng(1)

    def fake_features(x_uint8):
        flat = x_uint8.reshape(len(x_uint8), -1).astype(np.float32) / 255.0
        return flat[:, :16], flat[:, :10]

    fake_features.weights_tag = "random-init"  # as load_inception sets it
    acc = MetricAccumulator(feature_fn=fake_features)
    real = jnp.asarray(rng.uniform(0, 1, (8, 16, 16, 3)), jnp.float32)
    fake = jnp.clip(real + 0.2 * rng.normal(0, 1, real.shape)
                    .astype(np.float32), 0, 1)
    acc.update(fake, real)
    out = acc.compute()
    assert "fid_surrogate" in out and np.isfinite(out["fid_surrogate"])
    assert "precision_surrogate" in out
    for k in ("fid", "inception_score", "precision", "recall", "f1"):
        assert k not in out, k
    # an explicit real tag (e.g. a weights path) keeps the plain keys
    acc2 = MetricAccumulator(feature_fn=fake_features,
                             weights_tag="/weights/pt_inception.pth")
    acc2.update(fake, real)
    out2 = acc2.compute()
    assert "fid" in out2 and "inception_score" in out2


def test_metric_accumulator_padded_batch_unbiased():
    """Padded eval batches (data/celeba.py Loader pads the last batch to a
    static shape) must score identically to the unpadded data: metric inputs
    are sliced to n_valid and SSIM is image-count weighted."""
    rng = np.random.default_rng(3)

    def fake_features(x_uint8):
        flat = x_uint8.reshape(len(x_uint8), -1).astype(np.float32) / 255.0
        return flat[:, :16], flat[:, :10]

    real = jnp.asarray(rng.uniform(0, 1, (10, 16, 16, 3)), jnp.float32)
    fake = jnp.clip(real + 0.2 * rng.normal(0, 1, real.shape)
                    .astype(np.float32), 0, 1)

    # ground truth: two uneven batches fed exactly (6 + 4)
    acc_true = MetricAccumulator(feature_fn=fake_features)
    acc_true.update(fake[:6], real[:6])
    acc_true.update(fake[6:], real[6:])
    # padded path: second batch padded to 6 by repeating the last row
    pad = lambda x: jnp.concatenate([x, x[-1:], x[-1:]], 0)
    acc_pad = MetricAccumulator(feature_fn=fake_features)
    acc_pad.update(fake[:6], real[:6], n_valid=6)
    acc_pad.update(pad(fake[6:]), pad(real[6:]), n_valid=4)

    out_true, out_pad = acc_true.compute(), acc_pad.compute()
    for k in out_true:
        assert out_pad[k] == pytest.approx(out_true[k], rel=1e-5), k


# ---------------------------------------------------------------------------
# Manifold precision / recall (Kynkaanniemi et al. 2019)
# ---------------------------------------------------------------------------

def test_manifold_pr_identical_sets_are_perfect():
    from vgd_tpu.eval.metrics import manifold_precision_recall
    rng = np.random.default_rng(0)
    feats = rng.normal(0, 1, (200, 16))
    out = manifold_precision_recall(feats, feats.copy(), k=3)
    assert out["precision"] == pytest.approx(1.0)
    assert out["recall"] == pytest.approx(1.0)
    assert out["f1"] == pytest.approx(1.0)


def test_manifold_pr_disjoint_sets_are_zero():
    from vgd_tpu.eval.metrics import manifold_precision_recall
    rng = np.random.default_rng(1)
    real = rng.normal(0, 0.5, (150, 8))
    fake = rng.normal(100.0, 0.5, (150, 8))
    out = manifold_precision_recall(real, fake, k=3)
    assert out["precision"] == 0.0
    assert out["recall"] == 0.0
    assert out["f1"] == 0.0


def test_manifold_pr_mode_collapse_high_precision_low_recall():
    """Fake = a tight cluster inside the real manifold: every fake sample is
    on-manifold (precision ~1) but covers little of it (recall << 1)."""
    from vgd_tpu.eval.metrics import manifold_precision_recall
    rng = np.random.default_rng(2)
    real = rng.normal(0, 1.0, (400, 8))
    fake = rng.normal(0, 0.01, (400, 8))
    out = manifold_precision_recall(real, fake, k=3)
    assert out["precision"] > 0.9
    assert out["recall"] < 0.3
    assert 0 <= out["f1"] <= 1


def test_manifold_pr_too_few_samples_returns_nan():
    from vgd_tpu.eval.metrics import manifold_precision_recall
    out = manifold_precision_recall(np.zeros((2, 4)), np.zeros((10, 4)), k=3)
    assert np.isnan(out["precision"])


def test_metric_accumulator_reports_manifold_pr():
    rng = np.random.default_rng(4)

    def fake_features(x_uint8):
        flat = x_uint8.reshape(len(x_uint8), -1).astype(np.float32) / 255.0
        return flat[:, :16], flat[:, :10]

    acc = MetricAccumulator(feature_fn=fake_features)
    for _ in range(2):
        real = jnp.asarray(rng.uniform(0, 1, (8, 16, 16, 3)), jnp.float32)
        fake = jnp.clip(real + 0.1 * rng.normal(0, 1, real.shape)
                        .astype(np.float32), 0, 1)
        acc.update(fake, real)
    out = acc.compute()
    for k in ("precision", "recall", "f1"):
        assert k in out and 0.0 <= out[k] <= 1.0
