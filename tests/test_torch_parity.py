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
    from ngf*16, BN+ReLU, then — as in the actual reference, gan_code.py:49 —
    a stride-1 ConvTranspose2d(ch, 3, 3, 1, 1) + tanh (NOT a Conv2d; the
    importer must flip/swap its kernel)."""
    ch = [ngf * 16, ngf * 8, ngf * 4, ngf * 2, ngf]
    layers = [tnn.ConvTranspose2d(nz, ch[0], 4, 1, 0, bias=False),
              tnn.BatchNorm2d(ch[0]), tnn.ReLU(True)]
    for i in range(1, len(ch)):
        layers += [tnn.ConvTranspose2d(ch[i - 1], ch[i], 4, 2, 1, bias=False),
                   tnn.BatchNorm2d(ch[i]), tnn.ReLU(True)]
    layers += [tnn.ConvTranspose2d(ch[-1], 3, 3, 1, 1, bias=False),
               tnn.Tanh()]
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


def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda a: tuple(a.shape), tree)


def test_unet_import_structure(tmp_path):
    """import_unet must produce exactly the tree our UNet initialises
    (verified by swapping it in and running a forward)."""
    from vgd_tpu.io.torch_import import import_unet
    from vgd_tpu.models.unet import UNet

    model = UNet(out_ch=3, base_ch=16, time_emb_dim=32, attention=True)
    x = jnp.zeros((1, 32, 32, 3))
    t = jnp.zeros((1,), np.int32)
    variables = model.init(jax.random.key(0), x, t)

    # synthesise a torch-layout state_dict with matching shapes
    g = torch.Generator().manual_seed(0)
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = torch.randn(o, i, generator=g) * 0.05
        sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.05

    def conv(name, i, o, k):
        sd[f"{name}.weight"] = torch.randn(o, i, k, k, generator=g) * 0.05
        sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.05

    def gn(name, c):
        sd[f"{name}.weight"] = 1 + torch.randn(c, generator=g) * 0.05
        sd[f"{name}.bias"] = torch.randn(c, generator=g) * 0.05

    lin("time_mlp.0", 32, 128)
    lin("time_mlp.2", 128, 32)
    dims = {"down1": (3, 16), "down2": (16, 32), "down3": (32, 64),
            "bottleneck": (64, 64), "up3": (128, 32), "up2": (64, 16),
            "up1": (32, 16)}
    for name, (i, o) in dims.items():
        conv(f"{name}.conv.0", i, o, 3)
        gn(f"{name}.conv.1", o)
        conv(f"{name}.conv.3", o, o, 3)
        gn(f"{name}.conv.4", o)
        lin(f"{name}.time_emb_proj", 32, o)
        if i != o:
            conv(f"{name}.residual_conv", i, o, 1)
    for name, c in (("cross_attn2", 32), ("cross_attn3", 64)):
        lin(f"{name}.to_q", c, 256)
        lin(f"{name}.to_kv", 256, 512)
        lin(f"{name}.proj", 256, c)
        gn(f"{name}.norm", c)
        sd[f"{name}.global_tokens"] = torch.randn(1, 64, 256, generator=g)
    gn("attn_bottleneck.norm", 64)
    conv("attn_bottleneck.qkv", 64, 192, 1)
    conv("attn_bottleneck.proj", 64, 64, 1)
    conv("out_conv", 16, 3, 1)

    path = str(tmp_path / "unet.pth")
    torch.save(sd, path)
    imported = import_unet(path, attention=True)
    assert _tree_shapes(imported["params"]) == \
        _tree_shapes(variables["params"])
    y = model.apply(imported, x, t)
    assert np.isfinite(np.asarray(y)).all()


def test_glow_invconv_orientation_matches_torch_conv1x1():
    """our einsum('bhwi,oi->bhwo') must equal torch conv2d with a (O,I,1,1)
    kernel — the orientation the reference InvConv uses (nf_code.py:175)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 4, 5)).astype(np.float32)
    w = rng.standard_normal((5, 5)).astype(np.float32)   # (O, I)
    with torch.no_grad():
        yt = torch.nn.functional.conv2d(
            torch.tensor(x).permute(0, 3, 1, 2),
            torch.tensor(w)[:, :, None, None]).permute(0, 2, 3, 1).numpy()
    yj = np.asarray(jnp.einsum("bhwi,oi->bhwo", jnp.asarray(x),
                               jnp.asarray(w)))
    np.testing.assert_allclose(yj, yt, rtol=1e-5, atol=1e-5)


def test_glow_import_roundtrip(tmp_path):
    """import_glow -> our Glow: structure matches init(), the imported model
    is still exactly invertible, and the ZeroConv value-1 padding semantics
    match a direct torch computation of the prior."""
    from vgd_tpu.io.torch_import import import_glow
    from vgd_tpu.models.glow import Glow

    K, L, C = 2, 2, 3
    model = Glow(in_channels=C, n_flows=K, n_blocks=L, variant="image",
                 filter_size=8)
    ref_params = model.init(jax.random.key(0))

    g = torch.Generator().manual_seed(1)
    sd = {}
    ch = C
    for i in range(L):
        sq = ch * 4
        for k in range(K):
            pre = f"blocks.{i}.flows.{k}"
            sd[f"{pre}.ActNorm.b"] = torch.randn(1, sq, 1, 1, generator=g) * .1
            sd[f"{pre}.ActNorm.s"] = 1 + torch.randn(1, sq, 1, 1,
                                                     generator=g) * .1
            q, _ = torch.linalg.qr(torch.randn(sq, sq, generator=g))
            P, Lm, U = torch.linalg.lu(q)
            S = torch.diag(U)
            sd[f"{pre}.InvConv.P"] = P
            sd[f"{pre}.InvConv.L"] = Lm
            sd[f"{pre}.InvConv.U"] = torch.triu(U, 1)
            sd[f"{pre}.InvConv.S"] = torch.log(torch.abs(S))
            sd[f"{pre}.InvConv.S_sign"] = torch.sign(S)
            cp = f"{pre}.AffCoupling.neuralnet"
            sd[f"{cp}.0.weight"] = torch.randn(8, sq // 2, 3, 3,
                                               generator=g) * 0.05
            sd[f"{cp}.0.bias"] = torch.zeros(8)
            sd[f"{cp}.2.weight"] = torch.randn(8, 8, 1, 1, generator=g) * 0.05
            sd[f"{cp}.2.bias"] = torch.zeros(8)
            sd[f"{cp}.4.conv.weight"] = torch.randn(sq // 2, 8, 3, 3,
                                                    generator=g) * 0.01
            sd[f"{cp}.4.conv.bias"] = torch.zeros(sq // 2)
            sd[f"{cp}.4.scale"] = torch.randn(1, sq // 2, 1, 1,
                                              generator=g) * 0.1
        if i < L - 1:
            sd[f"blocks.{i}.prior.conv.weight"] = torch.randn(
                sq, sq // 2, 3, 3, generator=g) * 0.01
            sd[f"blocks.{i}.prior.conv.bias"] = torch.zeros(sq)
            sd[f"blocks.{i}.prior.scale"] = torch.randn(1, sq, 1, 1,
                                                        generator=g) * 0.1
            ch *= 2
        else:
            sd[f"blocks.{i}.prior.conv.weight"] = torch.randn(
                sq * 2, sq, 3, 3, generator=g) * 0.01
            sd[f"blocks.{i}.prior.conv.bias"] = torch.zeros(sq * 2)
            sd[f"blocks.{i}.prior.scale"] = torch.randn(1, sq * 2, 1, 1,
                                                        generator=g) * 0.1

    path = str(tmp_path / "glow.pth")
    torch.save(sd, path)
    imported = import_glow(path, n_blocks=L, n_flows=K)
    assert _tree_shapes(imported) == _tree_shapes(ref_params)

    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 16, 16, C)).astype(np.float32))
    log_p, logdet, z_outs = model.forward(imported, x)
    assert np.isfinite(float(jnp.sum(log_p))) and np.isfinite(float(logdet))
    x_rec = model.reverse(imported, z_outs, reconstruct=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                               rtol=1e-4, atol=1e-4)

def test_module_prefix_stripped(tmp_path):
    """DataParallel-prefixed state_dicts (the reference saves/loads Glow with
    `module.` keys, nf_code.py:624/652-657) import identically to plain
    ones."""
    tg = _torch_generator_64()
    _randomize(tg, seed=5)
    plain, prefixed = str(tmp_path / "g.pth"), str(tmp_path / "g_dp.pth")
    torch.save(tg.state_dict(), plain)
    torch.save({f"module.{k}": v for k, v in tg.state_dict().items()},
               prefixed)
    va = import_generator(plain, n_up=4)
    vb = import_generator(prefixed, n_up=4)
    la = jax.tree_util.tree_leaves(va)
    lb = jax.tree_util.tree_leaves(vb)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
