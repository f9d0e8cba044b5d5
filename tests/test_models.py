"""Model-layer tests: shapes at both reference resolutions, torch parity of
the transposed convolution, encoder flatten sizing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgd_tpu.models.gan import Discriminator, Generator
from vgd_tpu.models.vae import Encoder, kl_divergence, reparameterize
from vgd_tpu.ops.conv import conv_transpose2d

KEY = jax.random.key(0)


@pytest.mark.parametrize("size", [64, 256])
def test_generator_output_shape(size):
    g = Generator(img_size=size, nz=100)
    z = jnp.zeros((2, 1, 1, 100))
    variables = g.init(KEY, z, train=False)
    y = g.apply(variables, z, train=False)
    assert y.shape == (2, size, size, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh output


def test_generator_channel_progression_matches_reference_at_256():
    """gan_code.py:21-49: 1024,512,256,128,64,32,16 then 3."""
    g = Generator(img_size=256, nz=100, ngf=64)
    variables = g.init(KEY, jnp.zeros((1, 1, 1, 100)), train=False)
    p = variables["params"]
    assert p["up0"]["kernel"].shape == (4, 4, 100, 1024)
    for i, ch in enumerate([512, 256, 128, 64, 32, 16], start=1):
        assert p[f"up{i}"]["kernel"].shape[-1] == ch
    assert p["out"]["kernel"].shape == (3, 3, 16, 3)


@pytest.mark.parametrize("size", [64, 256])
def test_discriminator_output_shape(size):
    d = Discriminator(img_size=size)
    x = jnp.zeros((2, size, size, 3))
    variables = d.init(KEY, x, train=False)
    s = d.apply(variables, x, train=False)
    assert s.shape == (2,)
    assert float(jnp.min(s)) >= 0.0 and float(jnp.max(s)) <= 1.0  # sigmoid


def test_discriminator_first_stage_has_no_batchnorm():
    d = Discriminator(img_size=64)
    variables = d.init(KEY, jnp.zeros((1, 64, 64, 3)), train=False)
    assert "bn0" not in variables["params"]       # gan_code.py:61-62
    assert "bn1" in variables["params"]


def test_encoder_flatten_matches_reference():
    """main_vae.py:43-45 dummy-forward sizing: 64x64 -> (2,2,256) -> 1024."""
    e = Encoder(latent_dim=100)
    variables = e.init(KEY, jnp.zeros((1, 64, 64, 3)), train=False)
    assert variables["params"]["fc_mu"]["kernel"].shape == (1024, 100)
    mu, logvar = e.apply(variables, jnp.zeros((3, 64, 64, 3)), train=False)
    assert mu.shape == (3, 100) and logvar.shape == (3, 100)


def test_conv_transpose_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 5)).astype(np.float64)
    w = rng.standard_normal((5, 7, 4, 4)).astype(np.float64)  # torch (in,out,kh,kw)
    yt = torch.nn.functional.conv_transpose2d(
        torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(w),
        stride=2, padding=1).permute(0, 2, 3, 1).numpy()
    wj = np.transpose(w, (2, 3, 0, 1))  # -> HWIO
    with jax.enable_x64(True):
        yj = np.asarray(conv_transpose2d(jnp.asarray(x), jnp.asarray(wj),
                                         stride=2, padding=1))
    np.testing.assert_allclose(yt, yj, rtol=1e-10, atol=1e-10)


def test_reparameterize_clamps_logvar():
    mu = jnp.zeros((2, 4))
    logvar = jnp.array([[-50.0, 50.0, 0.0, 1.0]] * 2)
    z, lv = reparameterize(KEY, mu, logvar)
    assert float(jnp.min(lv)) == -10.0 and float(jnp.max(lv)) == 10.0
    assert z.shape == (2, 4)


def test_kl_divergence_reference_formula():
    """KL of N(0, I) against the prior must be 0."""
    mu = jnp.zeros((4, 10))
    logvar = jnp.zeros((4, 10))
    assert float(kl_divergence(mu, logvar)) == 0.0
    # -0.5*sum(1 + logvar - mu^2 - e^logvar) / B   (vaegan_code.py:114)
    mu = jnp.ones((2, 3))
    expected = -0.5 * (1 + 0 - 1 - 1) * 6 / 2
    np.testing.assert_allclose(float(kl_divergence(mu, jnp.zeros((2, 3)))),
                               expected, rtol=1e-6)
