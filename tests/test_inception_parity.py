"""InceptionV3 import parity — the FID/IS quality pillar.

The reference computes IS/FID through torchmetrics' InceptionV3
(vaegan_code.py:143-185, gan_code.py:111-145); torchmetrics wraps the
pytorch-fid FID-variant network (avg-pools with count_include_pad=False,
1008-way TF-layout logits, bilinear 299 resize, [0,1] -> [-1,1] rescale).

No weights file is downloadable in this environment, so — exactly like the
enc/dec/disc parity tests in test_torch_parity.py — this file constructs the
torch network IN-PROCESS as an independent fixture of the pytorch-fid spec,
randomises its parameters and BatchNorm running statistics, exports a
state_dict, imports it through ``vgd_tpu.io.torch_import.import_inception``,
and asserts forward parity of the 64-d features (the reference's
``feature=64``), the 2048-d pool and the logits. A second test checks the
FID statistic end-to-end: same Frechet value from torch-side and jax-side
features.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vgd_tpu.eval.metrics import (frechet_distance,  # noqa: E402
                                  inception_score_from_logits)


# ---------------------------------------------------------------------------
# torch fixture: pytorch-fid layout InceptionV3 (independent implementation)
# ---------------------------------------------------------------------------

class TBasic(tnn.Module):
    def __init__(self, i, o, k, stride=1, pad=0):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, k, stride, pad, bias=False)
        self.bn = tnn.BatchNorm2d(o, eps=1e-3)

    def forward(self, x):
        return tF.relu(self.bn(self.conv(x)))


def _avg(x):   # count_include_pad=False — the pytorch-fid modification
    return tF.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class TInceptionA(tnn.Module):
    def __init__(self, i, pool_features):
        super().__init__()
        self.branch1x1 = TBasic(i, 64, 1)
        self.branch5x5_1 = TBasic(i, 48, 1)
        self.branch5x5_2 = TBasic(48, 64, 5, pad=2)
        self.branch3x3dbl_1 = TBasic(i, 64, 1)
        self.branch3x3dbl_2 = TBasic(64, 96, 3, pad=1)
        self.branch3x3dbl_3 = TBasic(96, 96, 3, pad=1)
        self.branch_pool = TBasic(i, pool_features, 1)

    def forward(self, x):
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch1x1(x),
                          self.branch5x5_2(self.branch5x5_1(x)),
                          b3, self.branch_pool(_avg(x))], 1)


class TInceptionB(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = TBasic(i, 384, 3, stride=2)
        self.branch3x3dbl_1 = TBasic(i, 64, 1)
        self.branch3x3dbl_2 = TBasic(64, 96, 3, pad=1)
        self.branch3x3dbl_3 = TBasic(96, 96, 3, stride=2)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch3x3(x), bd, tF.max_pool2d(x, 3, 2)], 1)


class TInceptionC(tnn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = TBasic(i, 192, 1)
        self.branch7x7_1 = TBasic(i, c7, 1)
        self.branch7x7_2 = TBasic(c7, c7, (1, 7), pad=(0, 3))
        self.branch7x7_3 = TBasic(c7, 192, (7, 1), pad=(3, 0))
        self.branch7x7dbl_1 = TBasic(i, c7, 1)
        self.branch7x7dbl_2 = TBasic(c7, c7, (7, 1), pad=(3, 0))
        self.branch7x7dbl_3 = TBasic(c7, c7, (1, 7), pad=(0, 3))
        self.branch7x7dbl_4 = TBasic(c7, c7, (7, 1), pad=(3, 0))
        self.branch7x7dbl_5 = TBasic(c7, 192, (1, 7), pad=(0, 3))

        self.branch_pool = TBasic(i, 192, 1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg(x))], 1)


class TInceptionD(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = TBasic(i, 192, 1)
        self.branch3x3_2 = TBasic(192, 320, 3, stride=2)
        self.branch7x7x3_1 = TBasic(i, 192, 1)
        self.branch7x7x3_2 = TBasic(192, 192, (1, 7), pad=(0, 3))
        self.branch7x7x3_3 = TBasic(192, 192, (7, 1), pad=(3, 0))
        self.branch7x7x3_4 = TBasic(192, 192, 3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3, self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([b3, b7, tF.max_pool2d(x, 3, 2)], 1)


class TInceptionE(tnn.Module):
    def __init__(self, i, pool_mode):
        super().__init__()
        self.pool_mode = pool_mode   # 7b: avg (no pad-count); 7c: max
        self.branch1x1 = TBasic(i, 320, 1)
        self.branch3x3_1 = TBasic(i, 384, 1)
        self.branch3x3_2a = TBasic(384, 384, (1, 3), pad=(0, 1))
        self.branch3x3_2b = TBasic(384, 384, (3, 1), pad=(1, 0))
        self.branch3x3dbl_1 = TBasic(i, 448, 1)
        self.branch3x3dbl_2 = TBasic(448, 384, 3, pad=1)
        self.branch3x3dbl_3a = TBasic(384, 384, (1, 3), pad=(0, 1))
        self.branch3x3dbl_3b = TBasic(384, 384, (3, 1), pad=(1, 0))
        self.branch_pool = TBasic(i, 192, 1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = _avg(x) if self.pool_mode == "avg" else \
            tF.max_pool2d(x, 3, 1, 1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TInception3(tnn.Module):
    """pytorch-fid FID-variant InceptionV3 with the four feature taps."""

    def __init__(self, num_classes=1008):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasic(3, 32, 3, stride=2)
        self.Conv2d_2a_3x3 = TBasic(32, 32, 3)
        self.Conv2d_2b_3x3 = TBasic(32, 64, 3, pad=1)
        self.Conv2d_3b_1x1 = TBasic(64, 80, 1)
        self.Conv2d_4a_3x3 = TBasic(80, 192, 3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg")
        self.Mixed_7c = TInceptionE(2048, "max")
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x_unit):
        x = tF.interpolate(x_unit, size=(299, 299), mode="bilinear",
                           align_corners=False)
        x = x * 2.0 - 1.0
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = tF.max_pool2d(x, 3, 2)
        feat64 = x.mean(dim=(2, 3))
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = tF.max_pool2d(x, 3, 2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        feat2048 = x.mean(dim=(2, 3))
        return feat64, feat2048, self.fc(feat2048)


def _randomize_bn(model, seed=0):
    """Perturb BN affine params + running stats (conv/fc keep torch's
    fan-in-scaled default init so activations stay bounded through 94
    layers)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.copy_(1 + 0.1 * torch.randn(m.weight.shape,
                                                     generator=g))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(0.1 * torch.randn(
                    m.running_mean.shape, generator=g))
                m.running_var.copy_(1.0 + 0.1 * torch.rand(
                    m.running_var.shape, generator=g))


@pytest.fixture(scope="module")
def inception_pair(tmp_path_factory):
    torch.manual_seed(7)
    tm = TInception3()
    _randomize_bn(tm, seed=7)
    tm.eval()
    path = str(tmp_path_factory.mktemp("incep") / "inception.pth")
    torch.save(tm.state_dict(), path)

    from vgd_tpu.eval.inception import load_inception
    feature_fn, tag = load_inception(path, feature="64")
    assert tag == path

    rng = np.random.default_rng(0)
    x_u8 = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    with torch.no_grad():
        f64_t, f2048_t, logits_t = tm(
            torch.tensor(x_u8.transpose(0, 3, 1, 2), dtype=torch.float32)
            / 255.0)
    return {"path": path, "feature_fn": feature_fn, "x_u8": x_u8,
            "f64_t": f64_t.numpy(), "f2048_t": f2048_t.numpy(),
            "logits_t": logits_t.numpy()}


def test_inception_feature64_and_logits_parity(inception_pair):
    p = inception_pair
    f64_j, logits_j = p["feature_fn"](p["x_u8"])
    np.testing.assert_allclose(np.asarray(f64_j), p["f64_t"],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(logits_j), p["logits_t"],
                               rtol=1e-2, atol=1e-2)


def test_inception_feature2048_parity(inception_pair):
    from vgd_tpu.eval.inception import load_inception
    feature_fn, _ = load_inception(inception_pair["path"], feature="2048")
    f2048_j, _ = feature_fn(inception_pair["x_u8"])
    np.testing.assert_allclose(np.asarray(f2048_j),
                               inception_pair["f2048_t"],
                               rtol=1e-2, atol=1e-2)


def test_fid_end_to_end_matches_torch_side(inception_pair):
    """FID computed from jax-imported features equals FID computed from the
    torch model's own features on the same real/fake uint8 batches."""
    p = inception_pair
    tm = TInception3()
    tm.load_state_dict(torch.load(p["path"], weights_only=True))
    tm.eval()

    rng = np.random.default_rng(3)
    real = rng.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8)
    fake = np.clip(real.astype(np.int32)
                   + rng.integers(-40, 40, real.shape), 0, 255) \
        .astype(np.uint8)

    def t_feats(u8):
        with torch.no_grad():
            f64, _, _ = tm(torch.tensor(u8.transpose(0, 3, 1, 2),
                                        dtype=torch.float32) / 255.0)
        return f64.numpy()

    fid_torch = frechet_distance(t_feats(real), t_feats(fake))
    f_real, _ = p["feature_fn"](real)
    f_fake, _ = p["feature_fn"](fake)
    fid_jax = frechet_distance(np.asarray(f_real), np.asarray(f_fake))
    assert fid_torch > 0
    np.testing.assert_allclose(fid_jax, fid_torch, rtol=5e-3)


def test_inception_score_formula_golden():
    """IS on hand-computable logits: two symmetric one-hot classes ->
    p(y) uniform, KL = log 2 per sample, IS = 2."""
    big = 60.0
    logits = np.array([[big, 0.0], [0.0, big]] * 5, np.float64)
    mean, std = inception_score_from_logits(logits, splits=5)
    np.testing.assert_allclose(mean, 2.0, rtol=1e-6)
    np.testing.assert_allclose(std, 0.0, atol=1e-8)
