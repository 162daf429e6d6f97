"""Flash (blockwise online-softmax) self-attention kernel for TPU.

Replaces the naive attention in the encoder (which materializes the
[B, H, T, T] logits tensor in HBM) with a Pallas kernel that keeps the
running max/denominator in VMEM and never writes the score matrix out. This
is the HBM-bandwidth win that matters at long T, and the building block for
the sequence-parallel long-audio mode (SURVEY §2b SP/CP row): with K/V kept
whole per block and queries tiled, a later ring variant passes K/V blocks
between chips over ICI.

v1 scope: forward, full (non-causal) attention with a key-validity mask,
K/V resident in VMEM (fine to T ~= 16k at head_dim 128 in bf16).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
BLOCK_K = 256
NEG_INF = -1e30


def _flash_kernel(scale, block_k, q_ref, k_ref, v_ref, mask_ref, o_ref):
    """Grid: (BH, T // BLOCK_Q). Blocks:
    q_ref [1, BLOCK_Q, D], k_ref/v_ref [1, T, D], mask_ref [1, T] (int32,
    1 = valid key), o_ref [1, BLOCK_Q, D]."""
    T = k_ref.shape[1]
    D = q_ref.shape[2]
    n_k = T // block_k

    q = q_ref[0].astype(jnp.float32) * scale          # [BQ, D]

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        kmask = mask_ref[0, 0, pl.ds(j * block_k, block_k)]  # [BK] int32
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [BQ, BK]
        s = jnp.where(kmask[None, :] > 0, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # Explicitly zero masked keys: when a whole block is masked,
        # exp(NEG_INF - NEG_INF) would otherwise be 1.
        p = jnp.exp(s - m_new) * (kmask[None, :] > 0)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((q.shape[0], D), jnp.float32)
    m0 = jnp.full((q.shape[0], 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_k, body, (acc0, m0, l0))
    # Fully-masked query rows (l == 0) produce zeros, not NaNs.
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Blockwise attention.

    q, k, v: [B, T, H, D]; mask: [B, T] bool (key validity).
    Returns [B, T, H, D] in q's dtype. T must be a multiple of BLOCK_Q.
    """
    B, T, H, D = q.shape
    assert T % BLOCK_Q == 0 and T % BLOCK_K == 0, T
    scale = 1.0 / math.sqrt(D)

    # [B, T, H, D] -> [B*H, T, D]
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, T, D)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    # [B*H, 1, T]: the singleton axis keeps the block shape equal to the
    # trailing array dims, as the Mosaic lowering requires for int masks.
    maskb = jnp.repeat(mask.astype(jnp.int32), H, axis=0)[:, None, :]

    kernel = functools.partial(_flash_kernel, scale, BLOCK_K)
    out = pl.pallas_call(
        kernel,
        grid=(B * H, T // BLOCK_Q),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * T * D,
            bytes_accessed=(qb.size + kb.size + vb.size) * 4,
            transcendentals=B * H * T * T,
        ),
        interpret=interpret,
    )(qb, kb, vb, maskb)
    return out.reshape(B, H, T, D).transpose(0, 2, 1, 3)


def reference_attention(q, k, v, mask):
    """Plain-XLA ground truth with identical semantics (f32)."""
    B, T, H, D = q.shape
    scale = 1.0 / math.sqrt(D)
    logits = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", attn, v.astype(jnp.float32))
