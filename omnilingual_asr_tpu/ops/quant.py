"""Int8 weight quantization for serving.

Symmetric per-output-channel int8 quantization of dense weights with a
Pallas matmul kernel that dequantizes in the epilogue:

    y = (x_bf16 @ w_int8) * scale[out_ch]

This is weight-only (W8A16) quantization: weights halve their HBM
footprint and bandwidth and upcast to bf16 in VMEM for the MXU — the
standard memory-bound serving win. (Full int8xint8 MXU activation
quantization, which doubles peak FLOPs on v5e, is a later step.) The
reference has no such concept (all compute is remote).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel quantization.

    w: [in_dim, out_dim] f32 -> (w_q [in,out] int8, scale [out] f32)."""
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def dequantize_weight(w_q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return w_q.astype(jnp.float32) * scale[None, :]


def _q_matmul_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]                       # [BM, K] bf16
    w = w_ref[:]                       # [K, BN] int8
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = acc * s_ref[0, :][None, :]


BLOCK_M = 256
BLOCK_N = 512


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantized_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """x [M, K] (f32/bf16) @ int8 w_q [K, N] * scale [N] -> f32 [M, N].

    M must be a multiple of BLOCK_M and N of BLOCK_N (pad at call sites).
    """
    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2
    assert M % BLOCK_M == 0 and N % BLOCK_N == 0, (M, N)
    grid = (M // BLOCK_M, N // BLOCK_N)
    return pl.pallas_call(
        _q_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_M, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BLOCK_N), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_N), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_M, BLOCK_N), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w_q, scale[None, :].astype(jnp.float32))


def _q8a8_matmul_kernel(x_ref, w_ref, s_ref, o_ref):
    # Dynamic per-token activation quantization fused into the matmul:
    # int8 x int8 -> int32 runs at double the bf16 MXU peak on v5e.
    x = x_ref[:].astype(jnp.float32)                    # [BM, K]
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)  # [BM, 1]
    sx = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)               # [BM, BN] i32
    o_ref[:] = acc.astype(jnp.float32) * sx * s_ref[0, :][None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantized_matmul_a8(x: jnp.ndarray, w_q: jnp.ndarray,
                        scale: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """W8A8 dynamic-quant matmul: x [M, K] f32/bf16 @ w_q [K, N] int8.

    Activations are quantized per token (row absmax -> int8) inside the
    kernel, so no calibration pass is needed; y[m, n] =
    (xq[m] . wq[:, n]) * sx[m] * sw[n]. The int8 x int8 -> int32 dot uses
    the MXU's double-rate int8 path (v5e). Expected error vs f32 is
    ~0.5-1% relative — fine for serving, not for training.
    M must be a multiple of BLOCK_M and N of BLOCK_N (pad at call sites).
    """
    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2
    assert M % BLOCK_M == 0 and N % BLOCK_N == 0, (M, N)
    grid = (M // BLOCK_M, N // BLOCK_N)
    return pl.pallas_call(
        _q8a8_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_M, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BLOCK_N), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_N), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_M, BLOCK_N), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            # int8 dot: count as M*N*K MACs at double rate -> same flops
            # number, half the time on the int8 MXU path
            flops=2 * M * N * K,
            bytes_accessed=M * K * 4 + K * N + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(jnp.float32), w_q, scale[None, :].astype(jnp.float32))


def kernel_shapes_ok(in_dim: int, out_dim: int) -> bool:
    """The Pallas kernels tile N by BLOCK_N and keep K whole in VMEM."""
    return out_dim % BLOCK_N == 0 and in_dim % 128 == 0


def dense_quant_matmul(x: jnp.ndarray, w_q: jnp.ndarray,
                       scale: jnp.ndarray, mode: str = "a8",
                       interpret: bool = False) -> jnp.ndarray:
    """Shape-flexible front end for the quantized Pallas matmuls.

    x: [..., K] any leading shape; flattens to [M, K], pads M up to
    BLOCK_M, dispatches to the W8A8 (``mode="a8"``, int8 x int8 double-rate
    MXU path) or W8A16 (``mode="w8"``) kernel, and restores the shape.
    Caller must check :func:`kernel_shapes_ok` first.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    Mp = ((M + BLOCK_M - 1) // BLOCK_M) * BLOCK_M
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    fn = quantized_matmul_a8 if mode == "a8" else quantized_matmul
    y = fn(x2, w_q, scale, interpret=interpret)
    if Mp != M:
        y = y[:M]
    return y.reshape(*lead, w_q.shape[1])


def quantize_param_tree(params) -> Dict:
    """Quantize every dense 2-D weight in an ASR param pytree; returns a new
    tree where each quantized leaf dict {"w": ...} becomes
    {"w_q": int8, "w_scale": f32} (biases/LN untouched)."""
    def visit(node):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2:
                w_q, scale = quantize_weight(node["w"])
                out = {k: v for k, v in node.items() if k != "w"}
                out["w_q"] = w_q
                out["w_scale"] = scale
                return out
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(params)


def quantize_spec_tree(specs):
    """Transform a PartitionSpec tree to match quantize_param_tree's output:
    {"w": P(a, b)} -> {"w_q": P(a, b), "w_scale": P(b)}."""
    from jax.sharding import PartitionSpec as P

    def visit(node):
        if isinstance(node, dict):
            if "w" in node and isinstance(node["w"], P):
                out = {k: v for k, v in node.items() if k != "w"}
                wspec = node["w"]
                out["w_q"] = wspec
                out["w_scale"] = P(wspec[1] if len(wspec) > 1 else None)
                return out
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(specs)


def quantization_error(w: jnp.ndarray) -> float:
    """Relative L2 error of the int8 roundtrip (for reporting)."""
    w_q, s = quantize_weight(w)
    back = dequantize_weight(w_q, s)
    return float(jnp.linalg.norm(back - w) / jnp.linalg.norm(w))
