"""Pipeline parallelism: conformer blocks sharded by stage over the mesh.

SURVEY §2b PP row: an optional stage split across chip groups, noted as
"likely unnecessary at conformer scale — keep as an explicit, tested
no-op-able axis". This is that axis: L blocks stack along a leading dim,
shard over the 'stage' mesh axis (L/S blocks resident per chip), and M
microbatches rotate through the ring for S+M-1 steps — activations hop
stage->stage via `jax.lax.ppermute` (ICI), the classic GPipe-style schedule
expressed as one `lax.scan` under `shard_map`.

With S=1 the schedule degenerates to plain sequential execution (the
no-op-able property, tested).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..config import PipelineConfig
from ..models.conformer import conformer_block_apply
from .mesh import to_varying


def stack_blocks(blocks: list) -> Any:
    """List of L identical-structure block pytrees -> stacked pytree with a
    leading L axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def apply_stacked_blocks(stacked, x, mask, cos, sin, cfg: PipelineConfig,
                         dtype):
    """Sequentially apply stacked conformer blocks via lax.scan."""
    def body(h, blk):
        y, _aux = conformer_block_apply(blk, h, mask, cos, sin, cfg.encoder,
                                        dtype)
        return y, None

    out, _ = jax.lax.scan(body, x, stacked)
    return out


def pipeline_forward(stacked, x_mb, mask, cos, sin, cfg: PipelineConfig,
                     mesh: Mesh, axis: str = "stage"):
    """Run M microbatches through stage-sharded blocks.

    stacked: block pytree with leading dim L (L % S == 0); sharded so each
             stage holds L/S consecutive blocks.
    x_mb:    [M, B, T, D] microbatches (replicated input)
    mask:    [B, T] bool; cos/sin: RoPE tables (replicated)

    Returns [M, B, T, D] after all L blocks (replicated output).
    """
    S = mesh.shape[axis]
    M = x_mb.shape[0]
    dtype = jnp.dtype(cfg.encoder.dtype)
    n_steps = S + M - 1
    fwd = [(i, (i + 1) % S) for i in range(S)]

    def local_fn(stacked_l, x_mb_l, mask_l, cos_l, sin_l):
        # stacked_l leaves: [L/S, ...] (device-varying); the rest arrive
        # replicated — mark them varying so every op has a uniform vma type.
        x_mb_l, mask_l, cos_l, sin_l = (
            to_varying(t, axis) for t in (x_mb_l, mask_l, cos_l, sin_l))
        sid = jax.lax.axis_index(axis)
        B, T, D = x_mb_l.shape[1:]

        def step(carry, t):
            recv, outputs = carry
            m = t - sid  # microbatch this stage should process at step t
            active = (m >= 0) & (m < M)
            m_c = jnp.clip(m, 0, M - 1)
            inp = jnp.where(sid == 0, x_mb_l[m_c], recv)
            out = apply_stacked_blocks(stacked_l, inp, mask_l, cos_l, sin_l,
                                       cfg, dtype).astype(x_mb_l.dtype)
            out = jnp.where(active, out, recv)
            # The final stage commits its finished microbatch.
            m_last = t - (S - 1)
            commit = (sid == S - 1) & (m_last >= 0) & (m_last < M)
            committed = outputs.at[jnp.clip(m_last, 0, M - 1)].set(out)
            outputs = jnp.where(commit, committed, outputs)
            nxt = jax.lax.ppermute(out, axis, fwd)
            return (nxt, outputs), None

        recv0 = to_varying(jnp.zeros((B, T, D), x_mb_l.dtype), axis)
        outputs0 = jnp.zeros_like(x_mb_l)
        (_, outputs), _ = jax.lax.scan(
            step, (recv0, outputs0), jnp.arange(n_steps))
        # Results live on the last stage; psum broadcasts them so the output
        # can be declared replicated.
        outputs = jax.lax.psum(
            jnp.where(sid == S - 1, outputs, jnp.zeros_like(outputs)), axis)
        return outputs

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), stacked),
                  P(), P(), P(), P()),
        out_specs=P(),
    )(stacked, x_mb, mask, cos, sin)
