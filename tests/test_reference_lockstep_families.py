"""Lock-step training parity vs the reference's OWN code — remaining families.

tests/test_reference_lockstep.py pins VAE-GAN and the denoising VAE against
the reference's imported nn.Modules; these tests extend the same discipline
to the other three families so ALL FIVE are parity-demonstrated against the
actual upstream code rather than re-transcriptions:

* DCGAN  — gan_code.py:193-217 (D step on real/fake.detach(), G step against
  the updated D with the same z) vs GANTrainer.train_step.
* WGAN   — gan_code.py:300-330 (5 critic iterations each with a fresh z,
  mean-score loss, post-step clamp of EVERY critic param to +-0.01, then the
  G step) vs GANTrainer.train_step_wgan.
* Glow   — nf_code.py:577-607 (5-bit quantisation + uniform dequant noise,
  first-pass ActNorm data-dependent init, bits/dim loss) vs
  GlowTrainer.train_step, including forward z_outs/logdet parity and the
  reference's own `reverse` reconstruction (its stray breakpoint() at
  nf_code.py:447 is neutralised via PYTHONBREAKPOINT=0, reference_compat).
* DDPM   — train_diffusion.py:35-45 + diffusion_model.py UNet (q_sample,
  epsilon-MSE) vs DiffusionTrainer.train_step with identical t draws/noise.

Both sides start from the SAME exported weights (io/torch_import) and
consume the SAME random draws (the jax step's internal PRNG layout is
replayed for torch). Adam runs with eps=1e-3 on both sides — the measured
conditioning fix from test_reference_lockstep.py's module docstring: with
eps=1e-8, params whose true gradient ~0 get +-lr sign-of-noise updates and
the two frameworks branch chaotically despite matching gradients.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.optim as toptim  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    from vgd_tpu.io.reference_compat import import_reference
    try:
        return import_reference()
    except FileNotFoundError:
        pytest.skip("reference checkout not available")


def _export(module, tmp_path, name):
    path = str(tmp_path / f"{name}.pth")
    torch.save(module.state_dict(), path)
    return path


def _faces(n, size, seed=0):
    from vgd_tpu.data.celeba import synthetic_faces
    return synthetic_faces(n, (size, size), seed=seed)


def _nchw(x):
    return torch.tensor(np.ascontiguousarray(
        np.asarray(x, np.float32).transpose(0, 3, 1, 2)))


def _gan_sides(ref, tmp_path, wgan=False, seed=5):
    """Matched (torch nets+optims, our GANState, trainer) at 256px."""
    from vgd_tpu.core.config import DataConfig, GANConfig, RunConfig
    from vgd_tpu.io.torch_import import import_discriminator, import_generator
    from vgd_tpu.train.common import NetState, adam
    from vgd_tpu.train.gan import GANState, GANTrainer

    torch.manual_seed(seed)
    netG = ref.gan.Generator(nz=100)
    netD = ref.gan.Discriminator()
    netG.apply(ref.gan.weights_init)          # gan_code.py:174-175, 274-275
    netD.apply(ref.gan.weights_init)
    netG.train(), netD.train()

    cfg = GANConfig(data=DataConfig(image_size=(256, 256), batch_size=2),
                    run=RunConfig(compute_dtype="float32"), wgan=wgan)
    trainer = GANTrainer(cfg, (256, 256, 3))
    trainer.tx_g = adam(2e-4, b1=0.5, b2=0.999, eps=1e-3)
    trainer.tx_d = adam(2e-4, b1=0.5, b2=0.999, eps=1e-3)
    gen_v = jax.tree_util.tree_map(jnp.asarray, import_generator(
        _export(netG, tmp_path, "g"), n_up=6))
    dis_v = jax.tree_util.tree_map(jnp.asarray, import_discriminator(
        _export(netD, tmp_path, "d"), n_down=6))
    state = GANState(gen=NetState.create(gen_v, trainer.tx_g),
                     disc=NetState.create(dis_v, trainer.tx_d),
                     step=jnp.zeros((), jnp.int32))
    optG = toptim.Adam(netG.parameters(), lr=2e-4, betas=(0.5, 0.999),
                       eps=1e-3)
    optD = toptim.Adam(netD.parameters(), lr=2e-4, betas=(0.5, 0.999),
                       eps=1e-3)
    return (netG, netD, optG, optD), state, trainer


def test_dcgan_lockstep_vs_reference(ref, tmp_path):
    B, LAT, STEPS = 2, 100, 3
    (netG, netD, optG, optD), state, trainer = _gan_sides(ref, tmp_path)
    bce_t = tnn.BCELoss()

    faces = _faces(STEPS * B, 256)
    key = jax.random.key(3)
    traj_jax, traj_torch = [], []
    for i in range(STEPS):
        batch = faces[i * B:(i + 1) * B]
        skey = jax.random.fold_in(key, i)
        state, m = trainer.train_step(state, jnp.asarray(batch), skey)
        traj_jax.append([float(m["d_loss"]), float(m["g_loss"])])

        # gan_code.py:193-217 with the identical z draw (train/gan.py:69-70)
        k_z, = jax.random.split(skey, 1)
        z = np.asarray(jax.random.normal(k_z, (B, 1, 1, LAT), jnp.float32))
        z_t = torch.tensor(z.transpose(0, 3, 1, 2))
        x = _nchw(batch.astype(np.float32) / 127.5 - 1.0)
        netD.zero_grad()
        errD_real = bce_t(netD(x), torch.full((B,), 1.0))
        errD_real.backward()
        fake = netG(z_t)
        errD_fake = bce_t(netD(fake.detach()), torch.full((B,), 0.0))
        errD_fake.backward()
        optD.step()
        netG.zero_grad()
        errG = bce_t(netD(fake), torch.full((B,), 1.0))
        errG.backward()
        optG.step()
        traj_torch.append([(errD_real + errD_fake).item(), errG.item()])

    traj_jax, traj_torch = np.array(traj_jax), np.array(traj_torch)
    # step 0: pure forward/backward parity from identical weights
    np.testing.assert_allclose(traj_jax[0], traj_torch[0],
                               rtol=1e-3, atol=1e-4)
    # trajectory: BCE through a sigmoid D amplifies Adam drift (the same
    # conditioning story as the VAE-GAN adv term) — pinned at 1e-1
    np.testing.assert_allclose(traj_jax, traj_torch, rtol=1e-1, atol=1e-3)


def test_wgan_lockstep_vs_reference(ref, tmp_path):
    B, LAT, STEPS = 2, 100, 3
    (netG, netD, optG, optD), state, trainer = _gan_sides(ref, tmp_path,
                                                          wgan=True, seed=6)
    CLIP, CRITIC = 0.01, 5

    faces = _faces(STEPS * B, 256, seed=2)
    key = jax.random.key(4)
    traj_jax, traj_torch = [], []
    for i in range(STEPS):
        batch = faces[i * B:(i + 1) * B]
        skey = jax.random.fold_in(key, i)
        state, m = trainer.train_step_wgan(state, jnp.asarray(batch), skey)
        traj_jax.append([float(m["d_loss"]), float(m["g_loss"])])

        # gan_code.py:300-330 with identical per-iteration z draws
        # (train/gan.py:118,124,146)
        keys = jax.random.split(skey, CRITIC + 1)
        x = _nchw(batch.astype(np.float32) / 127.5 - 1.0)
        for c in range(CRITIC):
            netD.zero_grad()
            z = np.asarray(jax.random.normal(keys[c], (B, 1, 1, LAT),
                                             jnp.float32))
            d_loss = (netD(netG(torch.tensor(
                z.transpose(0, 3, 1, 2))).detach()).mean()
                - netD(x).mean())
            d_loss.backward()
            optD.step()
            for p in netD.parameters():      # gan_code.py:319-320
                p.data.clamp_(-CLIP, CLIP)
        netG.zero_grad()
        z = np.asarray(jax.random.normal(keys[-1], (B, 1, 1, LAT),
                                         jnp.float32))
        g_loss = -netD(netG(torch.tensor(z.transpose(0, 3, 1, 2)))).mean()
        g_loss.backward()
        optG.step()
        traj_torch.append([d_loss.item(), g_loss.item()])

    traj_jax, traj_torch = np.array(traj_jax), np.array(traj_torch)
    np.testing.assert_allclose(traj_jax[0], traj_torch[0],
                               rtol=1e-3, atol=1e-4)
    # the clamp keeps the critic bounded -> mean-score losses stay
    # well-conditioned; tighter pin than the BCE families
    np.testing.assert_allclose(traj_jax, traj_torch, rtol=2e-2, atol=1e-3)


def test_glow_lockstep_vs_reference(ref, tmp_path):
    from vgd_tpu.core.config import DataConfig, GlowConfig, RunConfig
    from vgd_tpu.io.torch_import import import_glow
    from vgd_tpu.train.common import adam
    from vgd_tpu.train.glow import GlowTrainer

    torch.manual_seed(9)
    B, SIZE, K, L, N_BITS, STEPS = 4, 16, 2, 2, 5, 3
    n_bins = 2.0 ** N_BITS
    model_t = ref.nf.GlowModel(3, K, L)
    model_t.train()

    cfg = GlowConfig(data=DataConfig(image_size=(SIZE, SIZE), batch_size=B,
                                     normalize=False),
                     run=RunConfig(compute_dtype="float32"),
                     n_flows=K, n_blocks=L, n_bits=N_BITS)
    trainer = GlowTrainer(cfg, (SIZE, SIZE, 3))
    trainer.tx = adam(1e-4, eps=1e-3)

    faces = _faces((STEPS + 1) * B, SIZE, seed=3)
    key = jax.random.key(21)

    def prep(batch, skey):
        """nf_code.py:582-596 / train/glow.py:_prep — shared dequant draw."""
        u = np.asarray(jax.random.uniform(skey, (B, SIZE, SIZE, 3),
                                          jnp.float32))
        # (x/255)*255 in f32, NOT x: both the reference (ToTensor then
        # image*255, nf_code.py:582) and our _prep (to_unit then *255,
        # ops/image.py:quantize_bits) round-trip through [0,1] — floor()
        # at exact bin boundaries depends on that rounding.
        x = batch.astype(np.float32) / np.float32(255.0) * np.float32(255.0)
        x = np.floor(x / 2 ** (8 - N_BITS))
        return x / n_bins - 0.5 + u / n_bins

    # ActNorm data-dependent init on the reference side (nf_code.py:589-594:
    # first-iteration no-grad forward), then export -> import so BOTH sides
    # hold the identical initialised parameters.
    init_key = jax.random.fold_in(key, 999)
    with torch.no_grad():
        model_t(torch.tensor(prep(faces[:B], init_key).transpose(0, 3, 1, 2)))
    params = jax.tree_util.tree_map(jnp.asarray, import_glow(
        _export(model_t, tmp_path, "glow"), n_blocks=L, n_flows=K))
    state = trainer._make_state(params)

    # ---- forward parity against the reference's own forward AND reverse
    x0 = prep(faces[:B], init_key)
    log_p_j, logdet_j, z_j = trainer.model.forward(params, jnp.asarray(x0))
    with torch.no_grad():
        log_p_t, logdet_t, z_t = model_t(torch.tensor(
            x0.transpose(0, 3, 1, 2)))
        x_rec_t = model_t.reverse(z_t, reconstruct=True)  # breakpoint() path
    np.testing.assert_allclose(np.asarray(log_p_j), log_p_t.numpy(),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(jnp.mean(logdet_j)),
                               logdet_t.mean().item(), rtol=1e-4)
    for zj, zt in zip(z_j, z_t):
        np.testing.assert_allclose(np.asarray(zj).transpose(0, 3, 1, 2),
                                   zt.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(x_rec_t.numpy().transpose(0, 2, 3, 1), x0,
                               rtol=1e-3, atol=1e-4)

    # ---- lock-step training
    opt = toptim.Adam(model_t.parameters(), lr=1e-4, eps=1e-3)
    traj_jax, traj_torch = [], []
    for i in range(STEPS):
        batch = faces[(i + 1) * B:(i + 2) * B]
        skey = jax.random.fold_in(key, i)
        state, m = trainer.train_step(state, jnp.asarray(batch), skey)
        traj_jax.append([float(m["loss"]), float(m["log_p"]),
                         float(m["logdet"])])

        x = torch.tensor(prep(batch, skey).transpose(0, 3, 1, 2))
        log_p, log_det, _ = model_t(x)                 # nf_code.py:596-607
        loss, log_p, log_det = ref.nf.calc_loss(log_p, log_det.mean(),
                                                SIZE, n_bins)
        opt.zero_grad()
        loss.backward()
        opt.step()
        traj_torch.append([loss.item(), log_p.item(), log_det.item()])

    traj_jax, traj_torch = np.array(traj_jax), np.array(traj_torch)
    np.testing.assert_allclose(traj_jax[0], traj_torch[0],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(traj_jax, traj_torch, rtol=1e-2, atol=1e-3)


def test_ddpm_lockstep_vs_reference(ref, tmp_path):
    from vgd_tpu.core.config import DataConfig, DiffusionConfig, RunConfig
    from vgd_tpu.io.torch_import import import_unet
    from vgd_tpu.train.common import adam
    from vgd_tpu.train.diffusion import DiffusionState, DiffusionTrainer

    torch.manual_seed(12)
    B, SIZE, T, STEPS = 2, 32, 1000, 3
    model_t = ref.unet.UNet(3, 3, base_ch=16, time_emb_dim=32)
    model_t.train()

    cfg = DiffusionConfig(data=DataConfig(image_size=(SIZE, SIZE),
                                          batch_size=B),
                          run=RunConfig(compute_dtype="float32"),
                          base_ch=16, time_emb_dim=32, timesteps=T)
    trainer = DiffusionTrainer(cfg, (SIZE, SIZE, 3))
    trainer.tx = adam(2e-4, eps=1e-3)
    variables = import_unet(_export(model_t, tmp_path, "unet"),
                            attention=True)
    params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
    state = DiffusionState(params=params, opt_state=trainer.tx.init(params),
                           step=jnp.zeros((), jnp.int32))

    # train_diffusion.py:99-107 schedule buffers
    betas = ref.diff.get_beta_schedule(T)
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
    sqrt_acp = torch.sqrt(alphas_cumprod)
    sqrt_1macp = torch.sqrt(1.0 - alphas_cumprod)
    opt = toptim.Adam(model_t.parameters(), lr=2e-4, eps=1e-3)

    faces = _faces(STEPS * B, SIZE, seed=4)
    key = jax.random.key(31)
    traj_jax, traj_torch = [], []
    for i in range(STEPS):
        batch = faces[i * B:(i + 1) * B]
        skey = jax.random.fold_in(key, i)
        state, m = trainer.train_step(state, jnp.asarray(batch), skey)
        traj_jax.append(float(m["loss"]))

        # identical t / noise draws (train/diffusion.py:141-144)
        k_t, k_n = jax.random.split(skey)
        t = np.asarray(jax.random.randint(k_t, (B,), 0, T))
        noise = np.asarray(jax.random.normal(k_n, (B, SIZE, SIZE, 3),
                                             jnp.float32))
        x0 = _nchw(batch.astype(np.float32) / 127.5 - 1.0)
        loss = ref.diff.diffusion_loss(model_t, x0, torch.tensor(t),
                                       _nchw(noise), sqrt_acp, sqrt_1macp)
        opt.zero_grad()
        loss.backward()
        opt.step()
        traj_torch.append(loss.item())

    traj_jax, traj_torch = np.array(traj_jax), np.array(traj_torch)
    np.testing.assert_allclose(traj_jax[0], traj_torch[0],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(traj_jax, traj_torch, rtol=1e-2, atol=1e-3)
