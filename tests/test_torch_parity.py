"""PyTorch-checkpoint import parity.

BASELINE.json requires FID/PSNR parity against PyTorch checkpoints, which
rests on bit-faithful weight import. These tests construct torch networks
with the REFERENCE architectures (independent fixture implementations of the
specs in gan_code.py:16-89 and main_vae.py:20-58), randomise all parameters
AND BatchNorm running stats, export a state_dict, import it through
vgd_tpu.io.torch_import, and compare eval-mode forward outputs.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vgd_tpu.io.torch_import import (import_discriminator, import_encoder,
                                     import_generator)
from vgd_tpu.models.gan import Discriminator, Generator
from vgd_tpu.models.vae import Encoder


def _randomize(module, seed=0):
    """Randomise parameters and BN running stats for a strong parity check."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in module.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(1.0 + 0.1 * torch.rand(
                    m.running_var.shape, generator=g))


class _Seq(tnn.Module):
    """Wrapper giving the reference's ``main.N.*`` state_dict key layout."""

    def __init__(self, layers):
        super().__init__()
        self.main = tnn.Sequential(*layers)

    def forward(self, x):
        return self.main(x)


def _torch_generator_64(nz=100, ngf=64):
    """Reference generator architecture at 64x64 depth (gan_code.py:16-54
    spec: convT(4,1,0) stem, stride-2 convT(4,2,1) stages halving channels
    from ngf*16, BN+ReLU, 3x3 conv + tanh)."""
    ch = [ngf * 16, ngf * 8, ngf * 4, ngf * 2, ngf]
    layers = [tnn.ConvTranspose2d(nz, ch[0], 4, 1, 0, bias=False),
              tnn.BatchNorm2d(ch[0]), tnn.ReLU(True)]
    for i in range(1, len(ch)):
        layers += [tnn.ConvTranspose2d(ch[i - 1], ch[i], 4, 2, 1, bias=False),
                   tnn.BatchNorm2d(ch[i]), tnn.ReLU(True)]
    layers += [tnn.Conv2d(ch[-1], 3, 3, 1, 1, bias=False), tnn.Tanh()]
    return _Seq(layers)


def _torch_discriminator_64(ndf=64):
    """Reference discriminator at 64x64 depth (gan_code.py:56-89 spec)."""
    ch = [ndf // 4, ndf // 2, ndf, ndf * 2]
    layers = [tnn.Conv2d(3, ch[0], 4, 2, 1, bias=False),
              tnn.LeakyReLU(0.2, True)]
    for i in range(1, len(ch)):
        layers += [tnn.Conv2d(ch[i - 1], ch[i], 4, 2, 1, bias=False),
                   tnn.BatchNorm2d(ch[i]), tnn.LeakyReLU(0.2, True)]
    layers += [tnn.Conv2d(ch[-1], 1, 4, 1, 0, bias=False), tnn.Sigmoid()]
    return _Seq(layers)


class _TorchEncoder(tnn.Module):
    """Reference encoder spec (main_vae.py:20-58): 4x [Conv(4,2,VALID)+BN+
    LeakyReLU(0.01)], flatten, two Linear heads."""

    def __init__(self, latent=100):
        super().__init__()
        chans = [3, 32, 64, 128, 256]
        blocks = []
        for i in range(1, len(chans)):
            blocks.append(tnn.Sequential())
            blocks[-1].add_module("conv", tnn.Conv2d(chans[i - 1], chans[i],
                                                     4, 2))
            blocks[-1].add_module("bn", tnn.BatchNorm2d(chans[i]))
            blocks[-1].add_module("act", tnn.LeakyReLU())
        self.cnn = tnn.Sequential(*blocks)
        self.fc_mu = tnn.Linear(1024, latent)
        self.fc_logvar = tnn.Linear(1024, latent)

    def forward(self, x):
        h = self.cnn(x).flatten(1)
        return self.fc_mu(h), self.fc_logvar(h)


def test_generator_import_parity(tmp_path):
    tg = _torch_generator_64()
    _randomize(tg)
    tg.eval()
    path = str(tmp_path / "gen.pth")
    torch.save(tg.state_dict(), path)

    variables = import_generator(path, n_up=4)
    g = Generator(img_size=64, nz=100)
    z = np.random.default_rng(0).standard_normal((2, 100, 1, 1)) \
        .astype(np.float32)
    with torch.no_grad():
        yt = tg(torch.tensor(z)).permute(0, 2, 3, 1).numpy()
    yj = np.asarray(g.apply(variables, jnp.asarray(z.transpose(0, 2, 3, 1)),
                            train=False))
    np.testing.assert_allclose(yj, yt, rtol=2e-4, atol=2e-4)


def test_discriminator_import_parity(tmp_path):
    td = _torch_discriminator_64()
    _randomize(td, seed=1)
    td.eval()
    path = str(tmp_path / "disc.pth")
    torch.save(td.state_dict(), path)

    variables = import_discriminator(path, n_down=4)
    d = Discriminator(img_size=64)
    x = np.random.default_rng(1).standard_normal((2, 3, 64, 64)) \
        .astype(np.float32)
    with torch.no_grad():
        st = td(torch.tensor(x)).view(-1).numpy()
    sj = np.asarray(d.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                            train=False))
    np.testing.assert_allclose(sj, st, rtol=2e-4, atol=2e-4)


def test_encoder_import_parity(tmp_path):
    te = _TorchEncoder()
    _randomize(te, seed=2)
    te.eval()
    path = str(tmp_path / "enc.pth")
    torch.save(te.state_dict(), path)

    variables = import_encoder(path)
    e = Encoder(latent_dim=100)
    x = np.random.default_rng(2).standard_normal((2, 3, 64, 64)) \
        .astype(np.float32)
    with torch.no_grad():
        mu_t, lv_t = te(torch.tensor(x))
    mu_j, lv_j = e.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         train=False)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(),
                               rtol=2e-4, atol=2e-4)
