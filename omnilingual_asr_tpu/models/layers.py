"""Functional layer library: explicit param pytrees + matching PartitionSpec
trees.

Design: every layer is a pair of pure functions
    <layer>_init(key, ...) -> params (dict pytree of jnp arrays)
    <layer>_apply(params, x, ...) -> y
plus a <layer>_spec(...) returning the same pytree shape filled with
jax.sharding.PartitionSpec leaves. This gives pjit full control of tensor
parallelism without a module framework in the way: shard the param tree with
the spec tree, and XLA inserts the collectives.

Compute dtype is bf16 by default (MXU native); params are stored fp32 and
cast at use. Axis names: 'data' (batch), 'model' (tensor parallel).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def _split(key, n):
    return jax.random.split(key, n)


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------

def dense_init(key, in_dim: int, out_dim: int, use_bias: bool = True):
    scale = 1.0 / math.sqrt(in_dim)
    w = jax.random.uniform(key, (in_dim, out_dim), jnp.float32, -scale, scale)
    p = {"w": w}
    if use_bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


#: When set ("a8" | "w8"), quantized dense layers route through the Pallas
#: kernels in ops/quant.py instead of dequantize+XLA-matmul. "a8" runs the
#: int8 x int8 double-rate MXU path (v5e). Single-chip serving only — under
#: tensor parallelism the weights are sharded and the XLA path (which GSPMD
#: partitions) stays in charge. Set via set_quant_kernel() BEFORE tracing.
#: THREAD-LOCAL: tracing is lazy, so the flag is held only around an
#: engine's own dispatch window; an engine tracing concurrently in another
#: thread sees its own value, never this one's (ADVICE r2: a process-wide
#: global baked the wrong matmul path into concurrent traces).
_QUANT_STATE = __import__("threading").local()


def set_quant_kernel(mode: Optional[str], interpret: bool = False) -> None:
    assert mode in (None, "a8", "w8"), mode
    _QUANT_STATE.mode = mode
    _QUANT_STATE.interpret = interpret


def _quant_kernel_mode() -> Optional[str]:
    return getattr(_QUANT_STATE, "mode", None)


def dense_apply(p, x, dtype=jnp.bfloat16):
    if "w_q" in p:
        if _quant_kernel_mode() is not None:
            from ..ops.quant import dense_quant_matmul, kernel_shapes_ok

            K, N = p["w_q"].shape
            if kernel_shapes_ok(K, N):
                y = dense_quant_matmul(x, p["w_q"], p["w_scale"],
                                       mode=_QUANT_STATE.mode,
                                       interpret=getattr(
                                           _QUANT_STATE, "interpret", False))
                if "b" in p:
                    y = y + p["b"].astype(jnp.float32)
                return y
        # W8A16 serving path (ops/quant.py): int8 weights live in HBM and
        # dequantize on the way into the MXU.
        w = p["w_q"].astype(dtype) * p["w_scale"].astype(dtype)[None, :]
    else:
        w = p["w"].astype(dtype)
    y = jnp.dot(x.astype(dtype), w, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y


def dense_spec(shard_in: Optional[str] = None, shard_out: Optional[str] = None,
               use_bias: bool = True):
    s = {"w": P(shard_in, shard_out)}
    if use_bias:
        s["b"] = P(shard_out)
    return s


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------

def layernorm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layernorm_apply(p, x, eps: float = 1e-5):
    x = x.astype(jnp.float32)
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"]


def layernorm_spec():
    return {"scale": P(None), "bias": P(None)}


# ---------------------------------------------------------------------------
# Rotary position embedding
# ---------------------------------------------------------------------------

def rope_angles(seq_len: int, head_dim: int, base: float = 10_000.0):
    """[seq_len, head_dim//2] rotation angles."""
    half = head_dim // 2
    inv_freq = 1.0 / (base ** (np.arange(0, half, dtype=np.float64) / half))
    t = np.arange(seq_len, dtype=np.float64)
    ang = np.outer(t, inv_freq)
    return jnp.asarray(np.cos(ang), jnp.float32), jnp.asarray(np.sin(ang), jnp.float32)


def apply_rope(x, cos, sin):
    """x: [..., T, n_heads, head_dim]; cos/sin: [T, head_dim//2]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)


# ---------------------------------------------------------------------------
# Multi-head self-attention (TP over heads)
# ---------------------------------------------------------------------------

def mhsa_init(key, d_model: int, n_heads: int):
    k1, k2, k3, k4 = _split(key, 4)
    return {
        "ln": layernorm_init(d_model),
        "wq": dense_init(k1, d_model, d_model, use_bias=False),
        "wk": dense_init(k2, d_model, d_model, use_bias=False),
        "wv": dense_init(k3, d_model, d_model, use_bias=False),
        "wo": dense_init(k4, d_model, d_model, use_bias=False),
    }


def mhsa_spec():
    return {
        "ln": layernorm_spec(),
        "wq": dense_spec(None, "model", use_bias=False),
        "wk": dense_spec(None, "model", use_bias=False),
        "wv": dense_spec(None, "model", use_bias=False),
        "wo": dense_spec("model", None, use_bias=False),
    }


def mhsa_apply(p, x, n_heads: int, mask, cos, sin, dtype=jnp.bfloat16,
               use_flash: bool = False, flash_interpret: bool = False):
    """x: [B, T, D]; mask: [B, T] bool (True = valid).

    use_flash routes through the Pallas blockwise kernel (inference path —
    no VJP yet); the default XLA einsum path is used for training."""
    B, T, D = x.shape
    h = layernorm_apply(p["ln"], x)
    q = dense_apply(p["wq"], h, dtype).reshape(B, T, n_heads, D // n_heads)
    k = dense_apply(p["wk"], h, dtype).reshape(B, T, n_heads, D // n_heads)
    v = dense_apply(p["wv"], h, dtype).reshape(B, T, n_heads, D // n_heads)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if use_flash:
        from ..ops.attention import flash_attention

        out = flash_attention(q.astype(dtype), k.astype(dtype),
                              v.astype(dtype), mask,
                              interpret=flash_interpret)
        out = out.astype(jnp.float32).reshape(B, T, D)
        return x + dense_apply(p["wo"], out, dtype)
    scale = 1.0 / math.sqrt(D // n_heads)
    logits = jnp.einsum("bthd,bshd->bhts", q.astype(dtype), k.astype(dtype),
                        preferred_element_type=jnp.float32) * scale
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.where(mask[:, None, None, :], logits, neg)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", attn.astype(dtype), v.astype(dtype),
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, T, D)
    return x + dense_apply(p["wo"], out, dtype)


# ---------------------------------------------------------------------------
# Conformer feed-forward module (half-step residual)
# ---------------------------------------------------------------------------

def ffn_init(key, d_model: int, mult: int):
    k1, k2 = _split(key, 2)
    return {
        "ln": layernorm_init(d_model),
        "w1": dense_init(k1, d_model, d_model * mult),
        "w2": dense_init(k2, d_model * mult, d_model),
    }


def ffn_spec():
    return {
        "ln": layernorm_spec(),
        "w1": dense_spec(None, "model"),
        "w2": dense_spec("model", None),
    }


def ffn_apply(p, x, dtype=jnp.bfloat16, half_step: bool = True):
    h = layernorm_apply(p["ln"], x)
    h = dense_apply(p["w1"], h, dtype)
    h = jax.nn.silu(h)
    h = dense_apply(p["w2"], h, dtype)
    return x + (0.5 * h if half_step else h)


# ---------------------------------------------------------------------------
# Conformer convolution module (depthwise, causal-free)
# ---------------------------------------------------------------------------

def convmod_init(key, d_model: int, kernel: int):
    k1, k2, k3 = _split(key, 3)
    scale = 1.0 / math.sqrt(kernel)
    return {
        "ln": layernorm_init(d_model),
        "pw1": dense_init(k1, d_model, 2 * d_model, use_bias=False),
        "dw": jax.random.uniform(k2, (kernel, d_model), jnp.float32, -scale, scale),
        "dw_ln": layernorm_init(d_model),
        "pw2": dense_init(k3, d_model, d_model, use_bias=False),
    }


def convmod_spec():
    return {
        "ln": layernorm_spec(),
        "pw1": dense_spec(None, "model", use_bias=False),
        # Depthwise kernel acts per-channel; shard channels on 'model'.
        "dw": P(None, "model"),
        "dw_ln": layernorm_spec(),
        "pw2": dense_spec("model", None, use_bias=False),
    }


def convmod_apply(p, x, mask, dtype=jnp.bfloat16):
    """Pointwise GLU -> depthwise conv over time -> LN -> swish -> pointwise."""
    B, T, D = x.shape
    h = layernorm_apply(p["ln"], x)
    h = dense_apply(p["pw1"], h, dtype)          # [B, T, 2D]
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)                    # GLU
    h = jnp.where(mask[:, :, None], h, 0.0)      # zero padded frames
    # Depthwise conv over time, SAME padding. Kept in f32: it is
    # bandwidth-bound (K multiply-adds per element, no MXU), and uniform
    # dtypes keep the AD transpose rule happy.
    kernel = p["dw"].astype(jnp.float32)         # [K, D]
    K = kernel.shape[0]
    pad_l = (K - 1) // 2
    pad_r = K - 1 - pad_l
    out = jax.lax.conv_general_dilated(
        h.astype(jnp.float32), kernel.reshape(K, 1, -1),
        window_strides=(1,), padding=((pad_l, pad_r),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=h.shape[-1],
    )
    out = layernorm_apply(p["dw_ln"], out)
    out = jax.nn.silu(out)
    out = dense_apply(p["pw2"], out, dtype)
    return x + out
