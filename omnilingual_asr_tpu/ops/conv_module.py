"""Fused conformer convolution-module kernel (Pallas/TPU).

XLA lowers depthwise `conv_general_dilated(feature_group_count=D)` poorly on
TPU (measured 5.4 ms per block at [8,768,512] — half the whole block's
cost). This kernel fuses the ENTIRE conv module in VMEM:

    LN -> pointwise(2D) -> GLU -> depthwise K taps (shifted FMA on the VPU)
       -> LN -> swish -> pointwise(D) -> residual add

One grid instance per batch row holds the full [T, D] sequence in VMEM, so
the depthwise taps are plain static slices — no halo exchange, no grouped
convolution lowering at all. The two pointwise projections run on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _conv_kernel(K, dtype, x_ref, mask_ref, ln_s, ln_b, pw1_ref, dw_ref,
                 dwln_s, dwln_b, pw2_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)                      # [T, D]
    T, D = x.shape
    h = _ln(x, ln_s[0], ln_b[0])
    g = jnp.dot(h.astype(dtype), pw1_ref[:].astype(dtype),
                preferred_element_type=jnp.float32)        # [T, 2D]
    a = g[:, :D]
    b = g[:, D:]
    glu = a * jax.nn.sigmoid(b)
    glu = glu * mask_ref[0, 0, :].astype(jnp.float32)[:, None]

    # Depthwise conv as K static shifted FMAs (VPU), SAME padding.
    pad_l = (K - 1) // 2
    padded = jnp.pad(glu, ((pad_l, K - 1 - pad_l), (0, 0)))
    out = jnp.zeros((T, D), jnp.float32)
    for k in range(K):
        out = out + padded[k:k + T, :] * dw_ref[k, :][None, :]

    out = _ln(out, dwln_s[0], dwln_b[0])
    out = jax.nn.silu(out)
    out = jnp.dot(out.astype(dtype), pw2_ref[:].astype(dtype),
                  preferred_element_type=jnp.float32)      # [T, D]
    o_ref[0] = (x + out).astype(o_ref.dtype)


def _conv_module_ref(x, mask, ln_scale, ln_bias, pw1, dw, dwln_scale,
                     dwln_bias, pw2):
    """Plain-XLA twin of the kernel math (same bf16 matmul dtype), used by
    the custom VJP: the backward recomputes through this and differentiates
    it, so training can run the fused kernel forward while grads match the
    XLA path exactly (VERDICT r1 #8)."""
    dtype = jnp.bfloat16
    xf = x.astype(jnp.float32)
    h = _ln(xf, ln_scale[None, None, :], ln_bias[None, None, :])
    g = jnp.dot(h.astype(dtype), pw1.astype(dtype),
                preferred_element_type=jnp.float32)
    D = x.shape[-1]
    glu = g[..., :D] * jax.nn.sigmoid(g[..., D:])
    glu = glu * mask.astype(jnp.float32)[:, :, None]
    K = dw.shape[0]
    pad_l = (K - 1) // 2
    padded = jnp.pad(glu, ((0, 0), (pad_l, K - 1 - pad_l), (0, 0)))
    T = x.shape[1]
    out = jnp.zeros_like(glu)
    for k in range(K):
        out = out + padded[:, k:k + T, :] * dw[k][None, None, :]
    out = _ln(out, dwln_scale[None, None, :], dwln_bias[None, None, :])
    out = jax.nn.silu(out)
    out = jnp.dot(out.astype(dtype), pw2.astype(dtype),
                  preferred_element_type=jnp.float32)
    return (xf + out).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _fused_conv_vjp(x, mask, ln_scale, ln_bias, pw1, dw, dwln_scale,
                    dwln_bias, pw2, interpret):
    return _fused_conv_fwd_kernel_call(x, mask, ln_scale, ln_bias, pw1, dw,
                                       dwln_scale, dwln_bias, pw2, interpret)


def fused_conv_module(x, mask, ln_scale, ln_bias, pw1, dw, dwln_scale,
                      dwln_bias, pw2, interpret: bool = False):
    """x: [B, T, D] f32; mask: [B, T] bool; weights as in convmod params.

    Returns [B, T, D] f32 (residual included). Differentiable: the forward
    runs the fused Pallas kernel; the backward rematerializes through the
    plain-XLA twin (same memory profile as the non-fused path).
    """
    return _fused_conv_vjp(x, mask, ln_scale, ln_bias, pw1, dw, dwln_scale,
                           dwln_bias, pw2, interpret)


def _fused_conv_fwd(x, mask, ln_scale, ln_bias, pw1, dw, dwln_scale,
                    dwln_bias, pw2, interpret):
    out = _fused_conv_fwd_kernel_call(x, mask, ln_scale, ln_bias, pw1, dw,
                                      dwln_scale, dwln_bias, pw2, interpret)
    return out, (x, mask, ln_scale, ln_bias, pw1, dw, dwln_scale,
                 dwln_bias, pw2)


def _fused_conv_bwd(interpret, res, g):
    (x, mask, ln_scale, ln_bias, pw1, dw, dwln_scale, dwln_bias, pw2) = res
    _, vjp = jax.vjp(_conv_module_ref, x, mask, ln_scale, ln_bias, pw1, dw,
                     dwln_scale, dwln_bias, pw2)
    grads = list(vjp(g))
    grads[1] = np.zeros(mask.shape, dtype=jax.dtypes.float0)  # bool mask
    return tuple(grads)


_fused_conv_vjp.defvjp(_fused_conv_fwd, _fused_conv_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_conv_fwd_kernel_call(x, mask, ln_scale, ln_bias, pw1, dw,
                                dwln_scale, dwln_bias, pw2,
                                interpret: bool = False):
    B, T, D = x.shape
    K = dw.shape[0]
    dtype = jnp.bfloat16
    kernel = functools.partial(_conv_kernel, K, dtype)
    row = lambda b: (b, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 2 * D), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, D), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * D * (2 * D + D) + B * T * D * K * 2,
            bytes_accessed=x.size * 8 + (D * 3 * D + K * D) * 4,
            transcendentals=B * T * D * 2,
        ),
        interpret=interpret,
    )(x,
      mask[:, None, :].astype(jnp.int32),
      ln_scale[None, :], ln_bias[None, :], pw1, dw,
      dwln_scale[None, :], dwln_bias[None, :], pw2)


def _dense_weight(leaf):
    """Dense weight from a plain or W8A16-quantized leaf (ops/quant.py)."""
    if "w_q" in leaf:
        return leaf["w_q"].astype(jnp.float32) * leaf["w_scale"][None, :]
    return leaf["w"]


def convmod_apply_fused(p, x, mask, interpret: bool = False):
    """Drop-in for layers.convmod_apply using the fused kernel."""
    return fused_conv_module(
        x.astype(jnp.float32), mask,
        p["ln"]["scale"], p["ln"]["bias"],
        _dense_weight(p["pw1"]), p["dw"],
        p["dw_ln"]["scale"], p["dw_ln"]["bias"],
        _dense_weight(p["pw2"]), interpret=interpret)
