"""Tensor parallelism over the mesh's ``model`` axis.

SURVEY.md §2c: the mesh is plumbed "so a `model` axis can later host TP for
the wide Glow coupling convs (512-filter 3x3)". This module makes that axis
real: the coupling NN's hidden filter dimension is sharded across ``model``
and jit's sharding propagation turns the two coupling convs into

    conv1:  x (replicated) . W1[:, :, :, f_shard]  -> h sharded on filters
    conv2:  h (f_shard)    . W2[:, :, f_shard, f_shard'] -> all-to-all
    zero:   h (f_shard)    . Wz[:, :, f_shard, out] -> psum over 'model'

with XLA inserting the collectives (no hand-written NCCL analogue — the
whole point of the Mesh/NamedSharding design). Activations between flows
stay replicated; only the wide hidden layer is split, which is where the
memory/FLOPs live (512 filters vs <=96 flow channels).

Use:
    params = shard_glow_coupling(mesh, params)       # place param shards
    out = jax.jit(model.forward)(params, x)          # propagation does TP
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vgd_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def coupling_param_specs() -> dict:
    """PartitionSpecs for one block's stacked coupling params (leading axis
    K from the flow scan, then HWIO conv layout)."""
    return {
        # hidden filters sharded on the output dim of conv1 ...
        "conv1": {"w": P(None, None, None, None, MODEL_AXIS),
                  "b": P(None, MODEL_AXIS)},
        # ... the contraction dim of conv2 (and its output again sharded)
        "conv2": {"w": P(None, None, None, MODEL_AXIS, None),
                  "b": P(None, None)},
        # ... and the contraction dim of the zero conv (psum on output)
        "zero": {"w": P(None, None, None, MODEL_AXIS, None),
                 "b": P(None, None),
                 "scale": P(None, None)},
    }


def shard_glow_coupling(mesh: Mesh, params) -> dict:
    """Place Glow params with coupling hidden-filter shards over ``model``
    and everything else replicated.

    Works on any pytree whose coupling leaves sit under
    ``...['coupling'][{'conv1','conv2','zero'}][{'w','b','scale'}]`` paths —
    the raw param dict, a GlowState, or an optimizer state mirroring the
    param structure (Adam's mu/nu trees reuse the same dict keys)."""
    specs = coupling_param_specs()

    def place(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        spec = P()
        if "coupling" in names and len(names) >= 2:
            sub = specs.get(names[-2], {})
            spec = sub.get(names[-1], P())
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_glow_state(mesh: Mesh, state, filter_size: int):
    """TP placement for a full Glow train state (params + optimizer state +
    step): coupling hidden filters sharded over ``model``, everything else
    replicated. The jitted train step then runs tensor-parallel purely via
    jit sharding propagation — no step-code changes (SURVEY.md §2c)."""
    tp = mesh.shape[MODEL_AXIS]
    if filter_size % tp != 0:
        raise ValueError(
            f"filter_size {filter_size} not divisible by the model axis "
            f"({tp} devices) — choose --mesh-model dividing the coupling "
            f"filter count")
    return shard_glow_coupling(mesh, state)


def shard_glow_batch(mesh: Mesh, x) -> jax.Array:
    """Shard the batch over ``data`` (composes DP x TP)."""
    return jax.device_put(
        x, NamedSharding(mesh, P(DATA_AXIS, None, None, None)))
