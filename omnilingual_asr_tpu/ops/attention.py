"""Flash (blockwise online-softmax) self-attention kernel for TPU.

Replaces the naive attention in the encoder (which materializes the
[B, H, T, T] logits tensor in HBM) with a Pallas kernel that keeps the
running max/denominator in VMEM and never writes the score matrix out. This
is the HBM-bandwidth win that matters at long T, and the building block for
the sequence-parallel long-audio mode (SURVEY §2b SP/CP row): with K/V kept
whole per block and queries tiled, a later ring variant passes K/V blocks
between chips over ICI.

Scope: full (non-causal) attention with a key-validity mask, K/V resident
in VMEM (fine to T ~= 16k at head_dim 128 in bf16). Forward AND backward
are Pallas kernels (custom VJP): the backward recomputes p from the saved
logsumexp rows instead of materializing the [B, H, T, T] score matrix, so
long-sequence training keeps the flash memory profile (VERDICT r1 #8).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
BLOCK_K = 256
NEG_INF = -1e30


def _flash_fwd_lse_kernel(scale, block_k, q_ref, k_ref, v_ref, mask_ref,
                          o_ref, lse_ref):
    """Grid: (BH, T // BLOCK_Q). Blocks: q_ref [1, BLOCK_Q, D], k_ref/v_ref
    [1, T, D], mask_ref [1, 1, T] (int32, 1 = valid key).

    Also writes per-row logsumexp L = m + log(l) for the backward pass;
    fully-masked rows store +1e30 so p == 0 in backward. When a whole key
    block is masked, p is explicitly zeroed (exp(NEG_INF - NEG_INF) would
    otherwise be 1)."""
    T = k_ref.shape[1]
    D = q_ref.shape[2]
    n_k = T // block_k

    q = q_ref[0].astype(jnp.float32) * scale

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        kmask = mask_ref[0, 0, pl.ds(j * block_k, block_k)]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = jnp.where(kmask[None, :] > 0, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
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
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)
    lse = jnp.where(l[:, 0] > 0, m[:, 0] + jnp.log(jnp.maximum(l[:, 0],
                                                               1e-30)),
                    jnp.float32(1e30))
    lse_ref[0, 0] = lse


def _flash_bwd_dq_kernel(scale, block_k, q_ref, k_ref, v_ref, mask_ref,
                         do_ref, lse_ref, delta_ref, dq_ref):
    """dQ: grid (BH, T // BLOCK_Q); K/V whole, p recomputed from lse."""
    T = k_ref.shape[1]
    n_k = T // block_k
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]

    def body(j, dq):
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        kmask = mask_ref[0, 0, pl.ds(j * block_k, block_k)]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse) * (kmask[None, :] > 0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    dq = jax.lax.fori_loop(
        0, n_k, body, jnp.zeros(q.shape, jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(scale, block_q, q_ref, k_ref, v_ref, mask_ref,
                          do_ref, lse_ref, delta_ref, dk_ref, dv_ref):
    """dK/dV: grid (BH, T // BLOCK_K); Q/dO whole, p recomputed."""
    T = q_ref.shape[1]
    n_q = T // block_q
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    kmask = mask_ref[0, 0, :]

    def body(j, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(j * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(j * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(j * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(j * block_q, block_q)][:, None]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # [BQ, Tk]
        p = jnp.exp(s - lse) * (kmask[None, :] > 0)
        dv_new = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [Tk, D]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [BQ, Tk]
        ds = p * (dp - delta)
        dk_new = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # [Tk, D]
        return dk_new, dv_new

    z = jnp.zeros(k.shape, jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_q, body, (z, z))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _to_bh(x, B, T, H, D):
    return x.transpose(0, 2, 1, 3).reshape(B * H, T, D)


def _from_bh(x, B, T, H, D):
    return x.reshape(B, H, T, D).transpose(0, 2, 1, 3)


def _fwd_lse(qb, kb, vb, maskb, scale, interpret):
    BH, T, D = qb.shape
    kernel = functools.partial(_flash_fwd_lse_kernel, scale, BLOCK_K)
    whole = lambda b, i: (b, 0, 0)  # noqa: E731
    blk = lambda b, i: (b, i, 0)    # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(BH, T // BLOCK_Q),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLOCK_Q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, D), qb.dtype),
            jax.ShapeDtypeStruct((BH, 1, T), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * T * T * D,
            bytes_accessed=(qb.size + kb.size + vb.size) * 4,
            transcendentals=BH * T * T,
        ),
        interpret=interpret,
    )(qb, kb, vb, maskb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_bh(qb, kb, vb, maskb, interpret):
    """[B*H, T, D] flash attention with a Pallas forward AND backward."""
    D = qb.shape[-1]
    out, _ = _fwd_lse(qb, kb, vb, maskb, 1.0 / math.sqrt(D), interpret)
    return out


def _flash_bh_fwd(qb, kb, vb, maskb, interpret):
    D = qb.shape[-1]
    out, lse = _fwd_lse(qb, kb, vb, maskb, 1.0 / math.sqrt(D), interpret)
    return out, (qb, kb, vb, maskb, out, lse)


def _flash_bh_bwd(interpret, res, do):
    qb, kb, vb, maskb, out, lse = res
    BH, T, D = qb.shape
    scale = 1.0 / math.sqrt(D)
    # delta_i = sum_d dO_id * O_id (tiny elementwise — plain XLA)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[:, None, :]                    # [BH, 1, T]
    whole = lambda b, i: (b, 0, 0)  # noqa: E731
    blk = lambda b, i: (b, i, 0)    # noqa: E731

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale, BLOCK_K),
        grid=(BH, T // BLOCK_Q),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLOCK_Q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLOCK_Q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, D), blk,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, T, D), qb.dtype),
        cost_estimate=pl.CostEstimate(
            flops=5 * BH * T * T * D,
            bytes_accessed=(qb.size * 3) * 4,
            transcendentals=BH * T * T,
        ),
        interpret=interpret,
    )(qb, kb, vb, maskb, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale, BLOCK_Q),
        grid=(BH, T // BLOCK_K),
        in_specs=[
            pl.BlockSpec((1, T, D), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLOCK_K), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_K, D), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_K, D), blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, D), kb.dtype),
            jax.ShapeDtypeStruct((BH, T, D), vb.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * BH * T * T * D,
            bytes_accessed=(qb.size * 3) * 4,
            transcendentals=BH * T * T,
        ),
        interpret=interpret,
    )(qb, kb, vb, maskb, do, lse, delta)

    dmask = np.zeros(maskb.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask


_flash_bh.defvjp(_flash_bh_fwd, _flash_bh_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Blockwise attention, differentiable (custom Pallas VJP).

    q, k, v: [B, T, H, D]; mask: [B, T] bool (key validity).
    Returns [B, T, H, D] in q's dtype. T must be a multiple of BLOCK_Q.
    """
    B, T, H, D = q.shape
    assert T % BLOCK_Q == 0 and T % BLOCK_K == 0, T
    qb = _to_bh(q, B, T, H, D)
    kb = _to_bh(k, B, T, H, D)
    vb = _to_bh(v, B, T, H, D)
    # [B*H, 1, T]: the singleton axis keeps the block shape equal to the
    # trailing array dims, as the Mosaic lowering requires for int masks.
    maskb = jnp.repeat(mask.astype(jnp.int32), H, axis=0)[:, None, :]
    out = _flash_bh(qb, kb, vb, maskb, interpret)
    return _from_bh(out, B, T, H, D)


def reference_attention(q, k, v, mask):
    """Plain-XLA ground truth with identical semantics (f32)."""
    B, T, H, D = q.shape
    scale = 1.0 / math.sqrt(D)
    logits = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", attn, v.astype(jnp.float32))
