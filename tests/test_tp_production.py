"""TP / SP / PP reachable from the production surface (VERDICT round-2 #2).

On the 8-device virtual CPU mesh:
* ``run_glow`` with ``RunConfig.mesh.model = 2`` trains DPxTP — coupling
  hidden filters sharded over ``model`` — with metrics matching the
  replicated model=1 run on the same data/seed;
* the CLI plumbs ``--mesh-data/--mesh-model`` into ``RunConfig.mesh``;
* ``run_diffusion`` with model>1 routes bottleneck attention through ring
  attention (sequence parallel) and matches the model=1 loss;
* ``pp_train_step`` (loss+grad+Adam through the GPipe flow stack) matches
  the sequential-scan training step.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vgd_tpu.core.config import (DataConfig, DiffusionConfig, GlowConfig,
                                 MeshConfig, RunConfig)
from vgd_tpu.train import loop as L


def _glow_cfg(tmp_path, tag, mesh):
    return GlowConfig(
        data=DataConfig(image_size=(16, 16), batch_size=8, dataset_size=16,
                        normalize=False),
        run=RunConfig(out_dir=str(tmp_path / tag), compute_dtype="float32",
                      sample_every_iters=3, checkpoint_every_iters=100,
                      mesh=mesh),
        n_flows=2, n_blocks=2, filter_size=32, n_iter=3)


def test_run_glow_tensor_parallel_matches_replicated(tmp_path):
    assert jax.device_count() == 8
    out_tp = L.run_glow(_glow_cfg(tmp_path, "tp",
                                  MeshConfig(data=4, model=2)), n_iter=3)
    out_dp = L.run_glow(_glow_cfg(tmp_path, "dp",
                                  MeshConfig(data=8, model=1)), n_iter=3)

    # TP run really sharded the coupling filters (and kept them sharded
    # through the jitted update steps)
    w1 = out_tp["state"].params["block0"]["flows"]["coupling"]["conv1"]["w"]
    assert not w1.sharding.is_fully_replicated
    w1_dp = out_dp["state"].params["block0"]["flows"]["coupling"]["conv1"]["w"]
    assert w1_dp.sharding.is_fully_replicated

    # identical data + seeds => the loss trajectories must match
    for r_tp, r_dp in zip(out_tp["log"], out_dp["log"]):
        np.testing.assert_allclose(r_tp["loss"], r_dp["loss"],
                                   rtol=1e-5, atol=1e-6)
    # and so must the trained params themselves
    p_tp = jax.tree_util.tree_leaves(out_tp["state"].params)
    p_dp = jax.tree_util.tree_leaves(out_dp["state"].params)
    for a, b in zip(p_tp, p_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_run_glow_tp_rejects_fused_coupling(tmp_path):
    cfg = dataclasses.replace(
        _glow_cfg(tmp_path, "tpf", MeshConfig(data=4, model=2)),
        fused_coupling=True)
    with pytest.raises(ValueError, match="fused-coupling"):
        L.run_glow(cfg, n_iter=1)


def test_cli_mesh_flags_reach_runconfig(monkeypatch):
    from vgd_tpu import cli
    seen = {}
    monkeypatch.setattr(L, "run_glow",
                        lambda cfg, **kw: seen.update(cfg=cfg))
    cli.main(["glow", "--mesh-data", "4", "--mesh-model", "2"])
    assert seen["cfg"].run.mesh == MeshConfig(data=4, model=2)
    cli.main(["glow"])
    assert seen["cfg"].run.mesh == MeshConfig()


def test_run_diffusion_sequence_parallel_matches_replicated(tmp_path):
    """model>1 routes the bottleneck self-attention through the ring; the
    per-epoch losses must match the single-axis DP run bit-for-bit-ish."""
    logs = {}
    for tag, mesh in (("sp", MeshConfig(data=4, model=2)),
                      ("dp", MeshConfig(data=8, model=1))):
        cfg = DiffusionConfig(
            data=DataConfig(image_size=(32, 32), batch_size=8,
                            dataset_size=16),
            run=RunConfig(out_dir=str(tmp_path / tag),
                          compute_dtype="float32", mesh=mesh),
            epochs=1, timesteps=10, base_ch=8, time_emb_dim=32,
            attention=True)
        logs[tag] = L.run_diffusion(cfg, max_steps_per_epoch=2)["log"]
    for r_sp, r_dp in zip(logs["sp"], logs["dp"]):
        np.testing.assert_allclose(r_sp["train_loss"], r_dp["train_loss"],
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(r_sp["val_loss"], r_dp["val_loss"],
                                   rtol=1e-4, atol=1e-6)


def test_pp_train_step_matches_sequential():
    """pp_train_step == the identical loss/grad/update computed through the
    single-device flow scan."""
    from vgd_tpu.models.glow import Glow
    from vgd_tpu.parallel.mesh import build_mesh
    from vgd_tpu.parallel.pipeline_parallel import pp_train_step

    glow = Glow(in_channels=3, n_flows=4, n_blocks=1, variant="image",
                filter_size=32)
    flows = glow.init(jax.random.key(0))["block0"]["flows"]
    xs = glow._squeeze(
        jax.random.normal(jax.random.key(1), (8, 8, 8, 3)) * 0.3)
    hw = xs.shape[1] * xs.shape[2]
    tx = optax.adam(1e-3)
    opt0 = tx.init(flows)

    import math

    def seq_loss(fl):
        def body(carry, fp):
            y, l = carry
            y, dl, _ = glow._flow_fwd(fp, y, hw, False)
            return (y, l + dl), None
        (y, ld), _ = jax.lax.scan(body, (xs, jnp.zeros(())), fl)
        log_p = -0.5 * jnp.sum(jnp.square(y), axis=(1, 2, 3)) \
            - 0.5 * math.log(2 * math.pi) * y[0].size
        return -(jnp.mean(log_p) + ld)

    ref_loss, ref_grads = jax.value_and_grad(seq_loss)(flows)
    upd, _ = tx.update(ref_grads, opt0, flows)
    ref_flows = optax.apply_updates(flows, upd)

    mesh = build_mesh(data=4, model=2)
    new_flows, _, loss = pp_train_step(mesh, glow, flows, opt0, tx, xs,
                                       n_microbatches=4)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(new_flows),
                    jax.tree_util.tree_leaves(ref_flows)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
