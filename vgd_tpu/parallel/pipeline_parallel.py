"""Pipeline parallelism: the Glow flow stack as a GPipe ring over ``model``.

The reference's deepest sequential structure is the Glow flow stack — K=32
identical-shape Flow steps per block (nf_code.py:459-505), executed one
after another. That homogeneity makes it the natural pipeline seam on a
TPU mesh:

* the stacked flow parameters (leading dim K) are sharded over the
  ``model`` axis — stage ``d`` holds flows ``[d*K/p, (d+1)*K/p)`` and scans
  them locally (the same ``lax.scan`` the single-device model compiles);
* a batch is split into M microbatches that stream through the stages with
  the classic ``M + p - 1``-tick schedule; activations (and the running
  logdet) hop stage→stage with ``lax.ppermute`` — ICI neighbour traffic
  only, no all-gather, and per-device parameter memory is O(K/p);
* stage p-1 collects finished microbatches; a masked ``psum`` replicates
  the result (and doubles as the correctness proof under shard_map's
  replication checker).

Gradients flow through ``scan`` + ``ppermute`` by ordinary autodiff;
``pp_train_step`` packages loss + grad + optimizer update through the
pipeline. ``__graft_entry__.dryrun_multichip`` drives a PP training step as
its PP leg, and tests verify output/logdet/gradient/update parity against
the single-device flow scan.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vgd_tpu.parallel.mesh import MODEL_AXIS


def _varying_like(x, ref_leaf):
    """Zero-valued array shaped like x that carries ref_leaf's varying
    manual axes (shard_map's typed scan carries reject unvarying inits).
    Uses a never-taken `where` branch rather than `0 * sum(ref)` so a
    non-finite flow param cannot inject NaN into the pipeline init."""
    z = jnp.zeros_like(x)
    s = jnp.sum(ref_leaf).astype(z.dtype)
    return jnp.where(jnp.zeros((), jnp.bool_), jnp.broadcast_to(s, z.shape),
                     z)


def pipeline_flows_local(glow, local_flows, x_mb: jax.Array,
                         axis_name: str = MODEL_AXIS
                         ) -> Tuple[jax.Array, jax.Array]:
    """Per-shard GPipe body (run under shard_map).

    local_flows: this stage's stacked flow params (leading dim K/p).
    x_mb: (M, Bm, H, W, C) microbatches, replicated (pre-squeezed to the
    flow channel count). Returns (y (M, Bm, H, W, C), logdet (M,)) —
    stage p-1's results, psum-replicated to every stage.
    """
    p = jax.lax.axis_size(axis_name)
    d = jax.lax.axis_index(axis_name)
    m = x_mb.shape[0]
    hw = x_mb.shape[2] * x_mb.shape[3]
    perm = [(i, (i + 1) % p) for i in range(p)]
    ref = jax.tree_util.tree_leaves(local_flows)[0]

    def stage(a, ld):
        def body(carry, fp):
            y, l = carry
            y, dl, _ = glow._flow_fwd(fp, y, hw, False)
            return (y, l + dl), None
        (y, l), _ = jax.lax.scan(body, (a, ld), local_flows)
        return y, l

    def tick(carry, t):
        recv_a, recv_l, ys, ls = carry
        # stage 0 injects microbatch t; later stages use the received hop
        inj = x_mb[jnp.clip(t, 0, m - 1)].astype(recv_a.dtype)
        a = jnp.where(d == 0, inj, recv_a)
        l = jnp.where(d == 0, jnp.zeros_like(recv_l), recv_l)
        y, l2 = stage(a, l)
        # stage p-1 finished microbatch t-(p-1) this tick
        idx = t - (p - 1)
        collect = jnp.logical_and(d == p - 1,
                                  jnp.logical_and(idx >= 0, idx < m))
        ci = jnp.clip(idx, 0, m - 1)
        ys = ys.at[ci].set(jnp.where(collect, y, ys[ci]))
        ls = ls.at[ci].set(jnp.where(collect, l2, ls[ci]))
        return (jax.lax.ppermute(y, axis_name, perm),
                jax.lax.ppermute(l2, axis_name, perm), ys, ls), None

    init = (_varying_like(x_mb[0], ref),
            _varying_like(jnp.zeros((), x_mb.dtype), ref),
            _varying_like(x_mb, ref),
            _varying_like(jnp.zeros((m,), x_mb.dtype), ref))
    (_, _, ys, ls), _ = jax.lax.scan(tick, init, jnp.arange(m + p - 1))
    last = (d == p - 1).astype(ys.dtype)
    ys = jax.lax.psum(ys * last, axis_name)
    ls = jax.lax.psum(ls * last, axis_name)
    return ys, ls


def pp_train_step(mesh: Mesh, glow, flows, opt_state, tx, x: jax.Array,
                  n_microbatches: int):
    """One pipeline-parallel TRAINING step over the flow stack.

    Loss is the single-block flow objective — standard-normal NLL of the
    pipelined output minus the mean logdet (nf_code.py:54-60 semantics
    without the multi-scale split) — with gradients flowing through
    ``scan`` + ``ppermute`` by ordinary autodiff (the transpose of a ring
    shift is the reverse ring shift), then an optimizer update on the
    stacked flow params. Returns (new_flows, new_opt_state, loss).
    """
    import math as _math

    import optax

    def loss_fn(fl):
        y, ld = pp_flow_stack(mesh, glow, fl, x, n_microbatches)
        log_p = -0.5 * jnp.sum(jnp.square(y), axis=(1, 2, 3)) \
            - 0.5 * _math.log(2 * _math.pi) * y[0].size
        return -(jnp.mean(log_p) + jnp.mean(ld))

    loss, grads = jax.value_and_grad(loss_fn)(flows)
    updates, new_opt = tx.update(grads, opt_state, flows)
    return optax.apply_updates(flows, updates), new_opt, loss


def pp_flow_stack(mesh: Mesh, glow, flows, x: jax.Array,
                  n_microbatches: int) -> Tuple[jax.Array, jax.Array]:
    """Global-shape driver: shard the stacked flow params over ``model``,
    split x (B, H, W, C) into microbatches, run the pipeline, and return
    (y (B, H, W, C), logdet (n_microbatches,)) replicated.

    x must already be squeezed to the flows' channel count (use
    ``glow._squeeze``); B must divide into n_microbatches evenly.
    """
    b = x.shape[0]
    assert b % n_microbatches == 0, (b, n_microbatches)
    k = jax.tree_util.tree_leaves(flows)[0].shape[0]
    p = mesh.shape[MODEL_AXIS]
    assert k % p == 0, (
        f"flow count K={k} must divide evenly over the {p}-way model axis "
        f"(each pipeline stage scans K/p flows); got K % p == {k % p}")
    x_mb = x.reshape((n_microbatches, b // n_microbatches) + x.shape[1:])
    fn = functools.partial(pipeline_flows_local, glow,
                           axis_name=MODEL_AXIS)
    ys, ls = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(MODEL_AXIS), P()),
        out_specs=(P(), P()))(flows, x_mb)
    return ys.reshape((b,) + x.shape[1:]), ls
