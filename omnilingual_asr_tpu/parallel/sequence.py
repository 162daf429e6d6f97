"""Sequence-parallel conformer forward: ONE long sequence sharded over the
mesh.

This is the full single-sequence long-audio mode of SURVEY §2b (SP/CP row):
instead of independent 30 s windows, a whole file's frames shard over the
mesh time-axis and the encoder runs as one program:

- FFN / LayerNorm / heads: frame-local -> no communication;
- attention: exact ring attention (ops/ring_attention.py) — K/V blocks
  rotate via ppermute;
- depthwise conv: halo exchange — each shard ppermutes its boundary frames
  to the neighbors so the K-tap filter sees the true context across shard
  edges (the communication analogue of the reference's chunk-boundary
  artifacts, which this mode eliminates entirely);
- RoPE: positions are global (shard offset = axis_index * T_local).

Verified bit-comparable to the dense single-device forward on CPU meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..config import PipelineConfig
from ..models import layers as L
from .mesh import to_varying


def _halo_exchange(x, pad_l: int, pad_r: int, axis: str):
    """Concatenate the right edge of the left neighbor and the left edge of
    the right neighbor onto a [T_local, D] shard (zeros at the sequence
    ends — the ring wraps, so mask the wrap-around contributions)."""
    n = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    fwd = [(i, (i + 1) % n) for i in range(n)]   # send to right
    bwd = [(i, (i - 1) % n) for i in range(n)]   # send to left
    left_edge = jax.lax.ppermute(x[-pad_l:, :], axis, fwd) if pad_l else None
    right_edge = jax.lax.ppermute(x[:pad_r, :], axis, bwd) if pad_r else None
    parts = []
    if pad_l:
        # first shard has no left context: zeros
        left_edge = jnp.where(me == 0, jnp.zeros_like(left_edge), left_edge)
        parts.append(left_edge)
    parts.append(x)
    if pad_r:
        right_edge = jnp.where(me == n - 1, jnp.zeros_like(right_edge),
                               right_edge)
        parts.append(right_edge)
    return jnp.concatenate(parts, axis=0)


def _sp_convmod(p, x, mask_col, axis: str):
    """Sequence-parallel conv module on a local shard [T_local, D]."""
    K = p["dw"].shape[0]
    pad_l = (K - 1) // 2
    pad_r = K - 1 - pad_l
    h = L.layernorm_apply(p["ln"], x)
    g = L.dense_apply(p["pw1"], h, jnp.float32)
    D = x.shape[-1]
    glu = g[:, :D] * jax.nn.sigmoid(g[:, D:])
    glu = glu * mask_col
    ext = _halo_exchange(glu, pad_l, pad_r, axis)      # [T_local+K-1, D]
    T_local = x.shape[0]
    out = jnp.zeros((T_local, D), jnp.float32)
    for k in range(K):
        out = out + ext[k:k + T_local, :] * p["dw"][k, :][None, :]
    out = L.layernorm_apply(p["dw_ln"], out)
    out = jax.nn.silu(out)
    out = L.dense_apply(p["pw2"], out, jnp.float32)
    return x + out


def _sp_attention(p, x, mask_local, cos, sin, n_heads: int, axis: str):
    """Sequence-parallel MHSA using the ring-attention math inline
    (per-shard Q, rotating K/V)."""
    import math

    T_local, D = x.shape
    h = L.layernorm_apply(p["ln"], x)
    q = L.dense_apply(p["wq"], h, jnp.float32).reshape(T_local, n_heads, -1)
    k = L.dense_apply(p["wk"], h, jnp.float32).reshape(T_local, n_heads, -1)
    v = L.dense_apply(p["wv"], h, jnp.float32).reshape(T_local, n_heads, -1)
    q = L.apply_rope(q[None], cos, sin)[0]
    k = L.apply_rope(k[None], cos, sin)[0]
    hd = D // n_heads
    scale = 1.0 / math.sqrt(hd)
    n = jax.lax.axis_size(axis)
    fwd = [(i, (i + 1) % n) for i in range(n)]

    qf = q.astype(jnp.float32) * scale

    def step(carry, _):
        acc, m, l, kb, vb, mb = carry
        s = jnp.einsum("thd,shd->hts", qf, kb.astype(jnp.float32))
        valid = mb[None, None, :] > 0
        s = jnp.where(valid, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        pex = jnp.exp(s - m_new) * valid
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(pex, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum("hts,shd->htd", pex,
                                           vb.astype(jnp.float32))
        kb = jax.lax.ppermute(kb, axis, fwd)
        vb = jax.lax.ppermute(vb, axis, fwd)
        mb = jax.lax.ppermute(mb, axis, fwd)
        return (acc_new, m_new, l_new, kb, vb, mb), None

    acc0 = jnp.zeros((n_heads, T_local, hd), jnp.float32)
    m0 = jnp.full((n_heads, T_local, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((n_heads, T_local, 1), jnp.float32)
    carry0 = jax.tree.map(
        lambda t: to_varying(t, axis),
        (acc0, m0, l0, k, v, mask_local.astype(jnp.int32)))
    (acc, m, l, _, _, _), _ = jax.lax.scan(step, carry0, None, length=n)
    out = (acc / jnp.maximum(l, 1e-30)).transpose(1, 0, 2).reshape(T_local, D)
    return x + L.dense_apply(p["wo"], out, jnp.float32)


def sp_conformer_forward(params, mel: jnp.ndarray, mask: jnp.ndarray,
                         cfg: PipelineConfig, mesh: Mesh,
                         axis: str = "data", all_heads: bool = False,
                         with_states: bool = False):
    """Sequence-parallel encoder forward over ONE sequence.

    mel: [T, n_mels] (T divisible by axis size * subsample_factor);
    mask: [T] bool. Returns {"ctc_logits": [T', V], "mask": [T']}, plus —
    with all_heads=True — lid/emotion logits and speaker_frames so the
    engine's sequence mode produces the full reference schema
    (VERDICT r1 #3): every head is frame-local, so they add zero
    communication. with_states=True additionally returns the pre-head
    encoder states as bf16 ``encoder_states`` [T', D] (feeds the
    translation/summary decoders in the engine's sequence mode).
    """
    sub = cfg.encoder.subsample_factor
    enc = cfg.encoder
    n_dev = mesh.shape[axis]
    T = mel.shape[0]
    assert T % (n_dev * sub) == 0, (T, n_dev, sub)
    Tp_local = T // sub // n_dev

    def local_fn(p, mel_l, mask_l):
        mel_l = to_varying(mel_l, axis)
        mask_l = to_varying(mask_l, axis)
        x = mel_l.reshape(Tp_local, sub * cfg.frontend.n_mels)
        m = mask_l.reshape(Tp_local, sub)[:, 0]
        x = L.dense_apply(p["subsample"], x, jnp.float32)
        x = L.layernorm_apply(p["in_ln"], x)
        # global RoPE positions for this shard
        me = jax.lax.axis_index(axis)
        cos_full, sin_full = L.rope_angles(Tp_local * n_dev, enc.head_dim)
        cos = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(cos_full), me * Tp_local, Tp_local, 0)
        sin = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(sin_full), me * Tp_local, Tp_local, 0)
        mask_col = m.astype(jnp.float32)[:, None]
        for blk in p["blocks"]:
            x = L.ffn_apply(blk["ffn1"], x[None], jnp.float32,
                            half_step=True)[0]
            x = _sp_attention(blk["mhsa"], x, m, cos, sin, enc.n_heads, axis)
            x = _sp_convmod(blk["conv"], x, mask_col, axis)
            x = L.ffn_apply(blk["ffn2"], x[None], jnp.float32,
                            half_step=True)[0]
            x = L.layernorm_apply(blk["ln_out"], x)
        ctc = L.dense_apply(p["ctc_head"], x, jnp.float32)
        if not all_heads:
            return ctc, m
        lid = L.dense_apply(p["lid_head"], x, jnp.float32)
        emo = L.dense_apply(p["emotion_head"], x, jnp.float32)
        h = jax.nn.relu(L.dense_apply(p["speaker_head"], x, jnp.float32))
        spk = L.dense_apply(p["spk_head2"], h, jnp.float32)
        if with_states:
            return ctc, m, lid, emo, spk, x.astype(jnp.bfloat16)
        return ctc, m, lid, emo, spk

    p_specs = jax.tree.map(lambda _: P(), params)
    if not all_heads:
        ctc, m = shard_map(
            local_fn, mesh=mesh,
            in_specs=(p_specs, P(axis, None), P(axis)),
            out_specs=(P(axis, None), P(axis)),
        )(params, mel, mask)
        return {"ctc_logits": ctc, "mask": m}
    n_out = 6 if with_states else 5
    out_specs = (P(axis, None), P(axis)) + (P(axis, None),) * (n_out - 2)
    outs = shard_map(
        local_fn, mesh=mesh,
        in_specs=(p_specs, P(axis, None), P(axis)),
        out_specs=out_specs,
    )(params, mel, mask)
    ctc, m, lid, emo, spk = outs[:5]
    result = {"ctc_logits": ctc, "mask": m, "lid_logits": lid,
              "emotion_logits": emo, "speaker_frames": spk}
    if with_states:
        result["encoder_states"] = outs[5]
    return result
