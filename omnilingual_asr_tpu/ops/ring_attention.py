"""Ring attention: sequence-parallel attention over the device mesh.

The long-audio mode of SURVEY §2b (SP/CP row): instead of cutting a file
into independent windows, the WHOLE sequence is sharded over chips along
time; each chip holds its local Q/K/V shard and K/V blocks rotate around the
ring via `jax.lax.ppermute` (XLA collective over ICI) while a blockwise
online-softmax accumulates exact attention. After `n` steps every query has
attended to every key — identical math to full attention, with O(T/n) memory
per chip and compute/communication overlap left to XLA.

This replaces the reference's only long-audio strategy — independent 300 s
chunks with naive merge (reference gemini_pipeline.py:541-682) — with a
single exact attention over the full sequence.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.6
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

NEG_INF = -1e30


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mask: jnp.ndarray, mesh: Mesh,
                   axis: str = "data") -> jnp.ndarray:
    """Exact attention with the sequence axis sharded over ``axis``.

    q, k, v: [B, T, H, D] (T divisible by the axis size); mask: [B, T] key
    validity. Returns [B, T, H, D] float32.
    """
    n = mesh.shape[axis]
    scale = 1.0 / math.sqrt(q.shape[-1])
    fwd_perm = [(i, (i + 1) % n) for i in range(n)]

    def local_fn(ql, kl, vl, ml):
        # ql/kl/vl: [B, Tl, H, D]; ml: [B, Tl]
        B, Tl, H, D = ql.shape
        qf = ql.astype(jnp.float32) * scale

        def step(carry, _):
            acc, m, l, kb, vb, mb = carry
            s = jnp.einsum("bthd,bshd->bhts", qf, kb.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
            valid = mb[:, None, None, :] > 0
            s = jnp.where(valid, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new) * valid
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jnp.einsum("bhts,bshd->bhtd", p, vb.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
            acc_new = acc * alpha + pv
            # rotate K/V/mask blocks to the next device in the ring
            kb = jax.lax.ppermute(kb, axis, fwd_perm)
            vb = jax.lax.ppermute(vb, axis, fwd_perm)
            mb = jax.lax.ppermute(mb, axis, fwd_perm)
            return (acc_new, m_new, l_new, kb, vb, mb), None

        acc0 = jnp.zeros((B, H, Tl, D), jnp.float32)
        m0 = jnp.full((B, H, Tl, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((B, H, Tl, 1), jnp.float32)
        mb0 = ml.astype(jnp.int32)
        # Mark replicated constants as device-varying over the ring axis so
        # the scan carry type matches the ppermute outputs (jax vma tracking
        # in shard_map); the shard inputs kl/vl/mb0 are already varying.
        from ..parallel.mesh import to_varying

        carry0 = jax.tree.map(lambda x: to_varying(x, axis),
                              (acc0, m0, l0, kl, vl, mb0))
        (acc, m, l, _, _, _), _ = jax.lax.scan(step, carry0, None, length=n)
        out = acc / jnp.maximum(l, 1e-30)          # [B, H, Tl, D]
        return out.transpose(0, 2, 1, 3)            # [B, Tl, H, D]

    spec4 = P(None, axis, None, None)
    spec2 = P(None, axis)
    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(spec4, spec4, spec4, spec2),
        out_specs=spec4,
    )(q, k, v, mask)
