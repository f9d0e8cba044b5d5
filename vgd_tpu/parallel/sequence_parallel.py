"""Sequence parallelism: ring attention over the mesh ``model`` axis.

The reference's attention (diffusion_model.py:44-61 self-attention,
:63-85 cross-attention to 64 global tokens) is single-device and
materialises the full (HW x HW) score matrix. For capability parity nothing
multi-device is required (SURVEY §5 "Long-context"), but the TPU-native
seam it names — "blockwise attention ... the natural seam if CP were ever
added" — is implemented here so the UNet's token axis can scale past one
chip's VMEM/HBM:

* tokens (the flattened H*W axis) are sharded over the mesh ``model`` axis;
* each device computes its query rows' attention against its resident
  key/value block, then passes the K/V block around the ring with
  ``lax.ppermute`` (neighbour hops ride the ICI torus — no all-gather, and
  peak memory per device is O(N/p) instead of O(N));
* partial results merge with the online-softmax rescaling flash attention
  uses, carried in f32.

Gradients flow through ``lax.scan`` + ``ppermute`` by ordinary autodiff
(the transpose of a ring shift is the reverse ring shift), so the same
function serves training. Cross-attention to the 64 learned global tokens
needs no ring: queries are data-sharded and K/V (64 tokens) replicate.

All functions here are the *per-shard* bodies to run under ``shard_map``;
``sp_self_attention`` wraps one for convenience and is what
``__graft_entry__.dryrun_multichip`` drives.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vgd_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def ring_attention_local(q: jax.Array, k: jax.Array, v: jax.Array,
                         axis_name: str = MODEL_AXIS,
                         scale: Optional[float] = None) -> jax.Array:
    """Per-shard ring attention body (run under shard_map).

    q, k, v: (B, N/p, D) local token shards of a (B, N, D) global array
    sharded over ``axis_name`` (p devices). Returns the (B, N/p, D) local
    output shard — numerically the same rows full attention would produce.
    """
    d = q.shape[-1]
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    p = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % p) for i in range(p)]

    # derive the initial carry from q so it carries q's varying manual axes
    # (shard_map's typed carries reject unvarying constants in the loop)
    acc0 = jnp.zeros_like(q, dtype=jnp.float32)
    m0 = jnp.full_like(q[..., 0], -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros_like(q[..., 0], dtype=jnp.float32)

    def step(carry, _):
        acc, m, l, kb, vb = carry
        logits = jnp.einsum("bnd,bmd->bnm", q, kb,
                            preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        alpha = jnp.exp(m - m_new)                      # rescale old state
        pexp = jnp.exp(logits - m_new[..., None])
        l = l * alpha + jnp.sum(pexp, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bnm,bmd->bnd", pexp.astype(vb.dtype), vb,
            preferred_element_type=jnp.float32)
        kb = jax.lax.ppermute(kb, axis_name, perm)      # ICI neighbour hop
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return (acc, m_new, l, kb, vb), None

    (acc, m, l, _, _), _ = jax.lax.scan(step, (acc0, m0, l0, k, v),
                                        None, length=p)
    return (acc / l[..., None]).astype(q.dtype)


def sp_self_attention(mesh: Mesh, q: jax.Array, k: jax.Array, v: jax.Array,
                      scale: Optional[float] = None) -> jax.Array:
    """Global-shape self-attention with batch sharded over ``data`` and
    tokens sharded over ``model``: shard_map of the ring body."""
    spec = P(DATA_AXIS, MODEL_AXIS, None)
    fn = functools.partial(ring_attention_local, axis_name=MODEL_AXIS,
                           scale=scale)
    return jax.shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec)(q, k, v)
