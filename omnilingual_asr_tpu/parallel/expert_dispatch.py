"""Expert-parallel MoE with all-to-all token dispatch.

The communication-optimal EP strategy (vs. the expert-sharded dense compute
in models/moe.py): tokens and experts both shard over one mesh axis; each
device routes its local tokens, packs them into per-destination capacity
buffers, `jax.lax.all_to_all`s them to the devices owning their experts,
runs ONLY the local experts on received tokens, and all-to-alls the results
back. Compute per device is O(C * n_dev) tokens instead of O(all tokens *
local experts).

Top-1 routing with per-(src,dst) capacity C; overflow tokens fall through
with zero expert output (standard capacity-factor behavior — the residual
connection keeps them intact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..models import layers as L
from .mesh import to_varying


def ep_moe_apply(p, x: jnp.ndarray, mesh: Mesh, axis: str = "model",
                 capacity_factor: float = 2.0,
                 data_axis: str = None) -> jnp.ndarray:
    """Expert-parallel MoE forward.

    p: params from models.moe.moe_ffn_init (stacked expert weights,
       sharded P(axis, ...) on their leading expert dim).
    x: [N, D] tokens, sharded P(axis, None) (N divisible by the axis size).
       With data_axis set (dp x ep mesh), tokens shard over
       P((data_axis, axis), None) and the all-to-all exchange stays within
       each data row (experts are replicated across 'data').
    Returns [N, D] tokens (residual added), same sharding.
    """
    n_dev = mesh.shape[axis]
    E = p["w1"].shape[0]
    assert E % n_dev == 0, (E, n_dev)
    e_local = E // n_dev
    N, D = x.shape
    n_shards = n_dev * (mesh.shape[data_axis] if data_axis else 1)
    n_loc = N // n_shards
    # per-(src,dst) capacity
    cap = max(1, int(capacity_factor * n_loc / n_dev))

    def local_fn(p_l, x_l):
        # p_l: expert weights [e_local, ...]; x_l: [n_loc, D]
        x_l = to_varying(x_l, axis)
        me = jax.lax.axis_index(axis)

        h = L.layernorm_apply(p_l["ln"], x_l)
        # f32 router to match the dense MoE path exactly (bf16 flips
        # near-tie routing decisions).
        logits = L.dense_apply(p_l["router"], h, jnp.float32)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        top = jnp.argmax(probs, axis=-1)              # [n_loc] expert id
        gate = jnp.take_along_axis(probs, top[:, None], axis=-1)[:, 0]
        dst = top // e_local                          # destination device
        local_eid = top % e_local

        # Pack tokens into [n_dev, cap, D] send buffers. Position of token i
        # within its destination's buffer = rank of i among tokens with the
        # same dst (overflow -> dropped).
        one_dst = jax.nn.one_hot(dst, n_dev, dtype=jnp.int32)  # [n_loc, n_dev]
        pos_in_dst = jnp.cumsum(one_dst, axis=0) - one_dst     # rank per dst
        pos = jnp.sum(pos_in_dst * one_dst, axis=-1)           # [n_loc]
        keep = pos < cap

        send_tok = jnp.zeros((n_dev, cap, D), h.dtype)
        send_eid = jnp.full((n_dev, cap), -1, jnp.int32)
        send_src = jnp.full((n_dev, cap), -1, jnp.int32)  # src row for return
        idx_d = jnp.where(keep, dst, 0)
        idx_p = jnp.where(keep, pos, 0)
        upd_tok = jnp.where(keep[:, None], h, 0.0)
        send_tok = send_tok.at[idx_d, idx_p].add(upd_tok)
        send_eid = send_eid.at[idx_d, idx_p].max(
            jnp.where(keep, local_eid, -1))
        send_src = send_src.at[idx_d, idx_p].max(
            jnp.where(keep, jnp.arange(n_loc), -1))

        # all_to_all: dim0 indexes destination device -> after exchange,
        # dim0 indexes source device.
        recv_tok = jax.lax.all_to_all(send_tok, axis, 0, 0, tiled=False)
        recv_eid = jax.lax.all_to_all(send_eid, axis, 0, 0, tiled=False)

        # Run local experts on received tokens: [n_dev, cap, D].
        # f32 expert compute to match the dense path (moe_ffn_apply's
        # default dtype); comms above stay in the activation dtype.
        flat = recv_tok.reshape(n_dev * cap, D).astype(jnp.float32)
        eid = recv_eid.reshape(n_dev * cap)
        valid = eid >= 0
        eid_c = jnp.clip(eid, 0, e_local - 1)
        w1 = p_l["w1"][eid_c]                         # [n, D, D*mult]
        b1 = p_l["b1"][eid_c]
        w2 = p_l["w2"][eid_c]
        b2 = p_l["b2"][eid_c]
        mid = jax.nn.silu(
            jnp.einsum("nd,ndf->nf", flat, w1) + b1)
        out = jnp.einsum("nf,nfd->nd", mid, w2) + b2
        out = jnp.where(valid[:, None], out, 0.0)
        out = out.reshape(n_dev, cap, D).astype(recv_tok.dtype)

        # Return to senders.
        back = jax.lax.all_to_all(out, axis, 0, 0, tiled=False)

        # Unpack: token i finds its result at back[dst[i], pos[i]].
        gathered = back[idx_d, idx_p]                  # [n_loc, D]
        gathered = jnp.where(keep[:, None], gathered, 0.0)
        y = gathered * gate[:, None].astype(gathered.dtype)
        return x_l + 0.5 * y.astype(x_l.dtype)

    p_specs = jax.tree.map(lambda _: P(axis), p)
    # router/ln are replicated (their leading dim is not experts)
    p_specs["ln"] = jax.tree.map(lambda _: P(), p["ln"])
    p_specs["router"] = jax.tree.map(lambda _: P(), p["router"])
    tok_spec = P((data_axis, axis), None) if data_axis else P(axis, None)
    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(p_specs, tok_spec),
        out_specs=tok_spec,
    )(p, x)
