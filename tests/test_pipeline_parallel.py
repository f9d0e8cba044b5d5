"""Pipeline-parallel Glow flow stack (parallel/pipeline_parallel.py) on the
8-device virtual CPU mesh: output + logdet parity vs the single-device
flow scan (nf_code.py:459-505 semantics), across stage counts and
microbatch counts.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vgd_tpu.models.glow import Glow
from vgd_tpu.parallel.mesh import build_mesh
from vgd_tpu.parallel.pipeline_parallel import pp_flow_stack

KEY = jax.random.key(5)


def _setup(n_flows=8, filter_size=32):
    glow = Glow(in_channels=3, n_flows=n_flows, n_blocks=1, variant="image",
                filter_size=filter_size)
    params = glow.init(jax.random.key(0))
    flows = params["block0"]["flows"]
    x = jax.random.normal(KEY, (8, 8, 8, 3)) * 0.3
    xs = glow._squeeze(x)                      # (8, 4, 4, 12)
    return glow, flows, xs


def _reference(glow, flows, xs):
    hw = xs.shape[1] * xs.shape[2]

    def body(carry, fp):
        y, l = carry
        y, dl, _ = glow._flow_fwd(fp, y, hw, False)
        return (y, l + dl), None

    (y, logdet), _ = jax.lax.scan(
        body, (xs, jnp.zeros((), xs.dtype)), flows)
    return y, logdet


def test_pp_matches_sequential_4_stages():
    glow, flows, xs = _setup()
    ref_y, ref_ld = _reference(glow, flows, xs)
    mesh = build_mesh(data=2, model=4)
    y, ld = pp_flow_stack(mesh, glow, flows, xs, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                               rtol=2e-5, atol=2e-6)
    # per-microbatch logdet equals the full-stack logdet (it is
    # batch-independent: actnorm/invconv determinants only)
    np.testing.assert_allclose(np.asarray(ld),
                               np.full(4, float(ref_ld)), rtol=2e-5)


def test_pp_all_devices_more_microbatches():
    glow, flows, xs = _setup()
    ref_y, _ = _reference(glow, flows, xs)
    mesh = build_mesh(data=1, model=8)
    y, _ = pp_flow_stack(mesh, glow, flows, xs, n_microbatches=8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                               rtol=2e-5, atol=2e-6)


def test_pp_single_stage_degenerates():
    glow, flows, xs = _setup()
    ref_y, ref_ld = _reference(glow, flows, xs)
    mesh = build_mesh(data=8, model=1)
    y, ld = pp_flow_stack(mesh, glow, flows, xs, n_microbatches=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ld),
                               np.full(2, float(ref_ld)), rtol=2e-5)


def test_pp_gradients_match_sequential():
    """The docstring's claim that autodiff flows through scan+ppermute:
    d(loss)/d(flow params) through the pipeline equals the sequential
    flow-scan gradient."""
    glow, flows, xs = _setup(n_flows=4)
    mesh = build_mesh(data=4, model=2)
    r = jax.random.normal(jax.random.fold_in(KEY, 3), xs.shape)

    def loss_seq(flows):
        y, _ = _reference(glow, flows, xs)
        return jnp.sum(y * r)

    def loss_pp(flows):
        y, _ = pp_flow_stack(mesh, glow, flows, xs, n_microbatches=2)
        return jnp.sum(y * r)

    g_seq = jax.grad(loss_seq)(flows)
    g_pp = jax.jit(jax.grad(loss_pp))(flows)
    for (ps, ls), (pp, lp) in zip(
            jax.tree_util.tree_leaves_with_path(g_seq),
            jax.tree_util.tree_leaves_with_path(g_pp)):
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(ls), rtol=5e-5, atol=5e-6,
            err_msg=jax.tree_util.keystr(ps))


# ---------------------------------------------------------------------------
# Production path: --pp-stages routes the FULL Glow training step's flow
# chains through the pipeline (models/glow.py _block_fwd pp path, reached
# from run_glow / the CLI) — trajectory parity vs the sequential scan.
# ---------------------------------------------------------------------------

def test_pp_production_trainer_trajectory_parity():
    import dataclasses

    from vgd_tpu.core.config import DataConfig, GlowConfig, RunConfig
    from vgd_tpu.data.celeba import synthetic_faces
    from vgd_tpu.train.glow import GlowTrainer

    cfg = GlowConfig(
        data=DataConfig(batch_size=8, image_size=(16, 16), normalize=False),
        run=RunConfig(compute_dtype="float32"),
        n_flows=4, n_blocks=2, filter_size=32,
        pp_stages=2, pp_microbatches=2)
    mesh = build_mesh(data=4, model=2)
    tr_pp = GlowTrainer(cfg, (16, 16, 3), pp_mesh=mesh)
    tr_seq = GlowTrainer(dataclasses.replace(cfg, pp_stages=0), (16, 16, 3))

    key = jax.random.key(11)
    faces = synthetic_faces(4 * 8, (16, 16), seed=13)
    batches = [jnp.asarray(faces[i * 8:(i + 1) * 8]) for i in range(4)]

    s_pp = tr_pp.init_step(tr_pp.init(key), batches[0], key)
    s_seq = tr_seq.init_step(tr_seq.init(key), batches[0], key)
    for i, b in enumerate(batches[1:]):
        k = jax.random.fold_in(key, i)
        s_pp, m_pp = tr_pp.train_step(s_pp, b, k)
        s_seq, m_seq = tr_seq.train_step(s_seq, b, k)
        np.testing.assert_allclose(float(m_pp["loss"]),
                                   float(m_seq["loss"]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(float(m_pp["logdet"]),
                                   float(m_seq["logdet"]),
                                   rtol=2e-4, atol=2e-4)
    # parameters track too (same updates through the pipelined grads)
    la = jax.tree_util.tree_leaves(s_pp.params)
    lb = jax.tree_util.tree_leaves(s_seq.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_run_glow_pp_stages_smoke(tmp_path):
    """The production driver end-to-end with --pp-stages semantics."""
    from vgd_tpu.core.config import DataConfig, GlowConfig, MeshConfig, \
        RunConfig
    from vgd_tpu.train import loop as L

    cfg = GlowConfig(
        data=DataConfig(batch_size=8, image_size=(16, 16), normalize=False,
                        dataset_size=32),
        run=RunConfig(out_dir=str(tmp_path), compute_dtype="float32",
                      mesh=MeshConfig(model=2), sample_every_iters=2,
                      checkpoint_every_iters=4),
        n_flows=4, n_blocks=2, filter_size=32, pp_stages=2, n_iter=4)
    out = L.run_glow(cfg)
    assert all(np.isfinite(v) for row in out["log"] for v in row.values())


def test_run_glow_pp_stages_mesh_mismatch():
    import pytest

    from vgd_tpu.core.config import DataConfig, GlowConfig, MeshConfig, \
        RunConfig
    from vgd_tpu.train import loop as L

    cfg = GlowConfig(
        data=DataConfig(batch_size=8, image_size=(16, 16), normalize=False,
                        dataset_size=16),
        run=RunConfig(out_dir="/tmp/pp_mismatch",
                      mesh=MeshConfig(model=2)),
        n_flows=4, n_blocks=2, filter_size=32, pp_stages=4, n_iter=2)
    with pytest.raises(ValueError, match="pp-stages"):
        L.run_glow(cfg)
