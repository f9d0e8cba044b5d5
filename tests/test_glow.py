"""Glow tests: forward∘reverse identity, logdet correctness, ActNorm
data-dependent init, EEG variant shapes (SURVEY.md §4: 'Glow forward∘reverse
== identity and logdet correctness')."""
import jax
import jax.numpy as jnp
import numpy as np

from vgd_tpu.core.config import DataConfig, GlowConfig, GlowEEGConfig
from vgd_tpu.models.glow import (Glow, calc_loss, calc_z_shapes,
                                 calc_z_shapes_eeg, squeeze2d, squeeze_time,
                                 unsqueeze2d, unsqueeze_time)
from vgd_tpu.train.glow import GlowEEGTrainer, GlowTrainer

KEY = jax.random.key(0)


def tiny_model():
    return Glow(in_channels=3, n_flows=2, n_blocks=2, variant="image",
                filter_size=32)


def test_squeeze_roundtrip_and_channel_order():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    y = squeeze2d(x)
    assert y.shape == (2, 2, 2, 12)
    np.testing.assert_array_equal(unsqueeze2d(y), x)
    # channel = c*4 + a*2 + s (torch view/permute order, nf_code.py:401-405)
    np.testing.assert_array_equal(y[0, 0, 0, 0], x[0, 0, 0, 0])   # c=0,a=0,s=0
    np.testing.assert_array_equal(y[0, 0, 0, 1], x[0, 0, 1, 0])   # s=1 -> w+1
    np.testing.assert_array_equal(y[0, 0, 0, 2], x[0, 1, 0, 0])   # a=1 -> h+1


def test_squeeze_time_roundtrip():
    x = jnp.arange(2 * 8 * 1 * 5, dtype=jnp.float32).reshape(2, 8, 1, 5)
    y = squeeze_time(x)
    assert y.shape == (2, 4, 1, 10)
    np.testing.assert_array_equal(unsqueeze_time(y), x)


def test_forward_reverse_identity():
    """reverse(z_outs, reconstruct=True) must reproduce the input exactly
    (invertibility is the defining property of the flow)."""
    model = tiny_model()
    params = model.init(KEY)
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    log_p, logdet, z_outs = model.forward(params, x)
    x_rec = model.reverse(params, z_outs, reconstruct=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                               rtol=1e-4, atol=1e-4)


def test_forward_reverse_identity_eeg():
    model = Glow(in_channels=6, n_flows=2, n_blocks=3, variant="eeg",
                 filter_size=16)
    params = model.init(KEY)
    x = jax.random.normal(KEY, (2, 32, 1, 6))
    _, _, z_outs = model.forward(params, x)
    x_rec = model.reverse(params, z_outs, reconstruct=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                               rtol=1e-4, atol=1e-4)


def test_actnorm_init_normalizes_first_batch():
    model = tiny_model()
    params = model.init(KEY)
    x = 5.0 + 2.0 * jax.random.normal(KEY, (4, 16, 16, 3))
    new_params = model.init_actnorm(params, x)
    # first flow of block0 sees the squeezed input; its init must whiten it:
    # s = 1/(std+1e-6), b = -mean  (nf_code.py:49-71)
    sq = squeeze2d(x)
    an = new_params["block0"]["flows"]["actnorm"]
    np.testing.assert_allclose(np.asarray(an["b"][0]),
                               -np.asarray(jnp.mean(sq, axis=(0, 1, 2))),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(an["s"][0]),
        1.0 / (np.asarray(jnp.std(sq, axis=(0, 1, 2), ddof=1)) + 1e-6),
        rtol=1e-5)
    # post-init forward must start from whitened activations: the first
    # actnorm output has ~zero mean / unit std per channel
    b0, s0 = np.asarray(an["b"][0]), np.asarray(an["s"][0])
    normed = s0 * (np.asarray(sq) + b0)
    np.testing.assert_allclose(normed.mean(axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(normed.std(axis=(0, 1, 2)), 1.0, atol=1e-2)


def test_logdet_value_additive_coupling_zero():
    """With additive coupling, total logdet = sum over flows of
    H*W*(sum log|s_actnorm| + sum log|s_invconv|)."""
    model = tiny_model()
    params = model.init(KEY)
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    _, logdet, _ = model.forward(params, x)
    expected = 0.0
    dims = {"block0": 8 * 8, "block1": 4 * 4}
    for bname, hw in dims.items():
        fp = params[bname]["flows"]
        expected += hw * np.sum(np.log(np.abs(np.asarray(
            fp["actnorm"]["s"]))))
        expected += hw * np.sum(np.asarray(fp["invconv"]["log_s"]))
    np.testing.assert_allclose(float(logdet), expected, atol=1e-3)


def test_plu_weight_is_orthogonal_at_init():
    """The PLU pieces reassemble the original QR rotation (orthogonal)."""
    model = tiny_model()
    params = model.init(KEY)
    plu = jax.tree_util.tree_map(lambda a: np.asarray(a[0]),
                                 params["block0"]["flows"]["invconv"])
    w = np.asarray(Glow._plu_weight(plu))
    np.testing.assert_allclose(w @ w.T, np.eye(w.shape[0]), atol=1e-4)


def test_z_shapes():
    assert calc_z_shapes(3, 64, 4) == [(32, 32, 6), (16, 16, 12),
                                       (8, 8, 24), (4, 4, 96)]
    # flow_eeg.py:360-363 values, NHWC layout
    assert calc_z_shapes_eeg(22, 160, 4) == [(80, 1, 22), (40, 1, 22),
                                             (20, 1, 22), (10, 1, 44)]


def test_calc_loss_formula():
    """bits/dim formula (nf_code.py:528-538)."""
    log_p = jnp.array([-1000.0, -1200.0])
    logdet = jnp.array(50.0)
    loss, lp, ld = calc_loss(log_p, logdet, 8, 32.0)
    n_pixel = 8 * 8 * 3
    expected = np.mean(-(-np.log(32.0) * n_pixel + 50.0 +
                         np.array([-1000., -1200.])) / (np.log(2) * n_pixel))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-6)


def test_glow_trainer_init_and_step():
    cfg = GlowConfig(data=DataConfig(image_size=(16, 16), batch_size=4,
                                     normalize=False),
                     n_flows=2, n_blocks=2, filter_size=32)
    tr = GlowTrainer(cfg, (16, 16, 3))
    state = tr.init(KEY)
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (4, 16, 16, 3), dtype=np.uint8))
    state = tr.init_step(state, batch, KEY)
    losses = []
    for i in range(3):
        state, m = tr.train_step(state, batch, jax.random.fold_in(KEY, i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    z = tr.sample_z(KEY, 2)
    imgs = tr.reverse(state, z)
    assert imgs.shape == (2, 16, 16, 3)


def test_glow_eeg_trainer_step_and_sample():
    cfg = GlowEEGConfig(num_channels=6, num_samples=32, n_flows=2,
                        n_blocks=3, filter_size=16, batch_size=4)
    tr = GlowEEGTrainer(cfg)
    state = tr.init(KEY)
    batch = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (4, 32, 1, 6)).astype(np.float32))
    state = tr.init_step(state, batch, KEY)
    state, m = tr.train_step(state, batch, KEY)
    assert np.isfinite(float(m["loss"]))
    fakes = tr.reverse(state, tr.sample_z(KEY, 3))
    assert fakes.shape == (3, 32, 1, 6)


def test_forward_reverse_identity_perturbed_f64():
    """With non-identity (perturbed) weights, f32 roundtrips accumulate
    conditioning error through the flow stack; in f64 the inverse must be
    exact — this pins the reverse-path LOGIC as correct independent of
    precision (the at-init identity test is nearly vacuous since all
    transforms start as identities)."""
    import numpy as np
    rng = np.random.default_rng(3)
    with jax.enable_x64(True):
        model = Glow(in_channels=3, n_flows=2, n_blocks=2, variant="image",
                     filter_size=8)
        params = model.init(jax.random.key(1))
        flat, treedef = jax.tree_util.tree_flatten_with_path(params), None
        leaves = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            names = [getattr(k, "key", str(k)) for k in path]
            leaf = jnp.asarray(np.asarray(leaf), jnp.float64)
            if any(n in names for n in ("L", "U", "log_s", "w", "scale",
                                        "b", "s")) and \
                    not any(n in names for n in ("P", "s_sign")):
                leaf = leaf + 0.2 * rng.standard_normal(leaf.shape)
            leaves.append(leaf)
        params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params), leaves)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)))
        _, _, z_outs = model.forward(params, x)
        x_rec = model.reverse(params, z_outs, reconstruct=True)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                                   atol=1e-7)


def test_plu_solve_accuracy_at_trained_conditioning():
    """The triangular-solve PLU inverse (replacing the reference's explicit
    torch.linalg.inv, nf_code.py:186) must invert the 1x1 conv to f32
    roundoff at trained-like conditioning (log-singular-values within
    +-3)."""
    import numpy as np
    from vgd_tpu.models.glow import _plu_init

    p = _plu_init(jax.random.key(1), 12)
    p = dict(p, log_s=jnp.asarray(np.linspace(-3, 3, 12), jnp.float32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 12)).astype(np.float32))
    W = Glow._plu_weight(p)
    y = jnp.einsum("bhwi,oi->bhwo", x, W,
                   precision=jax.lax.Precision.HIGHEST)
    x_rec = Glow._plu_solve(p, y)
    rel = float(jnp.max(jnp.abs(x_rec - x)) / jnp.max(jnp.abs(x)))
    assert rel < 1e-4, rel


def test_reverse_finite_guard_on_wild_weights():
    """Strongly perturbed (mid-training-like) weights amplify off-manifold
    samples through the inverse flow chain past f32 range — round 1's NaN
    sample grids. The REV_GUARD clamp must keep the reverse finite (the
    reference's f32 math infs on the same inputs) without affecting sane
    magnitudes."""
    import numpy as np
    rng = np.random.default_rng(5)
    model = Glow(in_channels=3, n_flows=8, n_blocks=2, variant="image",
                 filter_size=8)
    params = model.init(jax.random.key(2))
    leaves = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = [getattr(k, "key", str(k)) for k in path]
        if any(n in names for n in ("L", "U", "log_s", "w", "scale",
                                    "b", "s")) and \
                not any(n in names for n in ("P", "s_sign")):
            leaf = leaf + 0.6 * rng.standard_normal(leaf.shape) \
                .astype(np.float32)
        leaves.append(leaf)
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), leaves)
    # temperature-0.7 prior samples, the mid-training sampling path
    # (nf_code.py:613-621)
    from vgd_tpu.models.glow import calc_z_shapes
    zs = [0.7 * jnp.asarray(rng.standard_normal((2,) + s), jnp.float32)
          for s in calc_z_shapes(3, 16, 2)]
    x = model.reverse(params, zs)
    assert np.isfinite(np.asarray(x)).all()


def test_glow_remat_matches_outputs_and_grads():
    """jax.checkpoint on the flow-scan body changes memory, not math."""
    from vgd_tpu.models.glow import Glow
    x = jax.random.normal(KEY, (2, 8, 8, 3)) * 0.3
    base = Glow(in_channels=3, n_flows=3, n_blocks=2, variant="image",
                filter_size=16)
    rem = Glow(in_channels=3, n_flows=3, n_blocks=2, variant="image",
               filter_size=16, remat=True)
    params = base.init(jax.random.key(0))

    lp_b, ld_b, _ = base.forward(params, x)
    lp_r, ld_r, _ = rem.forward(params, x)
    np.testing.assert_allclose(np.asarray(lp_r), np.asarray(lp_b),
                               rtol=1e-6)
    np.testing.assert_allclose(float(ld_r), float(ld_b), rtol=1e-6)

    def loss(m, p):
        lp, ld, _ = m.forward(p, x)
        return -(jnp.mean(lp) + jnp.mean(ld))

    g_b = jax.grad(lambda p: loss(base, p))(params)
    g_r = jax.grad(lambda p: loss(rem, p))(params)
    for (pb, lb), (pr, lr) in zip(
            jax.tree_util.tree_leaves_with_path(g_b),
            jax.tree_util.tree_leaves_with_path(g_r)):
        np.testing.assert_allclose(np.asarray(lr), np.asarray(lb),
                                   rtol=1e-4, atol=5e-7,
                                   err_msg=jax.tree_util.keystr(pb))
