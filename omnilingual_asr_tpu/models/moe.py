"""Mixture-of-Experts FFN with expert parallelism (SURVEY §2b EP row).

Optional per-language capacity scaling for the 1600-language setting: the
conformer FFN becomes E experts with a learned top-1 router. Experts shard
over the 'model' mesh axis (P('model', ...) on the stacked expert dim), so
each device owns E/n_model experts.

v1 dispatch strategy — expert-sharded dense compute: every device runs its
LOCAL experts over all tokens and the one-hot routing mask zeroes the rest;
GSPMD inserts the psum combine. This is compute-redundant (factor ~E/top1)
but communication-light and exactly correct; the capacity-based all-to-all
dispatch (communication-optimal) is the planned upgrade once expert counts
grow. A load-balancing auxiliary loss keeps routing uniform.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from . import layers as L


def moe_ffn_init(key, d_model: int, n_experts: int, mult: int = 4):
    k_r, k_1, k_2 = jax.random.split(key, 3)
    scale1 = 1.0 / math.sqrt(d_model)
    scale2 = 1.0 / math.sqrt(d_model * mult)
    return {
        "ln": L.layernorm_init(d_model),
        "router": L.dense_init(k_r, d_model, n_experts, use_bias=False),
        # stacked expert weights: [E, in, out]
        "w1": jax.random.uniform(k_1, (n_experts, d_model, d_model * mult),
                                 jnp.float32, -scale1, scale1),
        "b1": jnp.zeros((n_experts, d_model * mult), jnp.float32),
        "w2": jax.random.uniform(k_2, (n_experts, d_model * mult, d_model),
                                 jnp.float32, -scale2, scale2),
        "b2": jnp.zeros((n_experts, d_model), jnp.float32),
    }


def moe_ffn_spec():
    return {
        "ln": L.layernorm_spec(),
        "router": L.dense_spec(None, None, use_bias=False),
        # experts shard over 'model': each device owns E/n_model experts
        "w1": P("model", None, None),
        "b1": P("model", None),
        "w2": P("model", None, None),
        "b2": P("model", None),
    }


def moe_ffn_apply(p, x, dtype=jnp.float32,
                  half_step: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, T, D] -> (y [B, T, D], aux_loss scalar).

    aux_loss is the standard load-balance term
    E * sum_e f_e * p_e (Switch Transformer), ~1 when balanced.
    """
    B, T, D = x.shape
    E = p["w1"].shape[0]
    h = L.layernorm_apply(p["ln"], x)                       # [B, T, D]
    logits = L.dense_apply(p["router"], h, dtype)           # [B, T, E]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top = jnp.argmax(probs, axis=-1)                        # [B, T]
    onehot = jax.nn.one_hot(top, E, dtype=jnp.float32)      # [B, T, E]
    gate = jnp.take_along_axis(probs, top[..., None], axis=-1)  # [B, T, 1]

    # Dense expert compute, masked combine (see module docstring).
    # NOTE: no preferred_element_type here — XLA:CPU lacks the
    # bf16xbf16->f32 dot thunk; on TPU pass dtype=bf16 and the MXU still
    # accumulates f32 internally.
    hh = h.astype(dtype)
    mid = jnp.einsum("btd,edf->btef", hh, p["w1"].astype(dtype))
    mid = jax.nn.silu(mid.astype(jnp.float32)
                      + p["b1"][None, None].astype(jnp.float32))
    out = jnp.einsum("btef,efd->bted", mid.astype(dtype),
                     p["w2"].astype(dtype)).astype(jnp.float32)
    out = out + p["b2"][None, None].astype(jnp.float32)
    y = jnp.einsum("bted,bte->btd", out, onehot) * gate

    # load-balance aux: fraction routed to e  x  mean router prob of e
    f = onehot.mean(axis=(0, 1))                            # [E]
    pr = probs.mean(axis=(0, 1))                            # [E]
    aux = E * jnp.sum(f * pr)

    y = x + (0.5 * y if half_step else y)
    return y, aux
