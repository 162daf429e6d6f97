"""Conformer encoder + multi-task heads: the on-device replacement for the
reference's single remote `generate_content` call (reference
gemini_pipeline.py:512-530).

One XLA program produces everything the reference's JSON schema asks Gemini
for (schema at gemini_pipeline.py:123-198):

    log-mel [B, T, n_mels]
      -> frame-stacking subsampler (x4, pure matmul — MXU-friendly)
      -> N conformer blocks (FFN half-step / MHSA+RoPE / depthwise conv / FFN)
      -> heads:
         ctc      [B, T', vocab]    transcription (byte-level CTC)
         lid      [B, T', n_langs]  frame-level language ID -> code-switching
         emotion  [B, T', 4]        happy/sad/angry/neutral (schema enum,
                                    gemini_pipeline.py:133-136)
         speaker  [B, T', spk_dim]  frame speaker embeddings -> diarization

All params are fp32 pytrees mirrored by PartitionSpec trees (see
``asr_param_specs``) so the whole model runs under pjit with tensor
parallelism over the 'model' mesh axis and batch over 'data'.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..config import EncoderConfig, PipelineConfig
from . import layers as L

# Head dimensions (lane-aligned).
N_LANGS = 2048       # >= 1600 languages, padded to a power of two
N_EMOTIONS = 4
SPK_DIM = 256


def conformer_block_init(key, cfg: EncoderConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if cfg.n_experts > 0:
        from .moe import moe_ffn_init

        ffn2 = moe_ffn_init(k4, cfg.d_model, cfg.n_experts, cfg.ffn_mult)
    else:
        ffn2 = L.ffn_init(k4, cfg.d_model, cfg.ffn_mult)
    return {
        "ffn1": L.ffn_init(k1, cfg.d_model, cfg.ffn_mult),
        "mhsa": L.mhsa_init(k2, cfg.d_model, cfg.n_heads),
        "conv": L.convmod_init(k3, cfg.d_model, cfg.conv_kernel),
        "ffn2": ffn2,
        "ln_out": L.layernorm_init(cfg.d_model),
    }


def conformer_block_spec(cfg: Optional[EncoderConfig] = None):
    if cfg is not None and cfg.n_experts > 0:
        from .moe import moe_ffn_spec

        ffn2 = moe_ffn_spec()
    else:
        ffn2 = L.ffn_spec()
    return {
        "ffn1": L.ffn_spec(),
        "mhsa": L.mhsa_spec(),
        "conv": L.convmod_spec(),
        "ffn2": ffn2,
        "ln_out": L.layernorm_spec(),
    }


def conformer_block_apply(p, x, mask, cos, sin, cfg: EncoderConfig, dtype,
                          flash_interpret: bool = False):
    x = L.ffn_apply(p["ffn1"], x, dtype)
    x = L.mhsa_apply(p["mhsa"], x, cfg.n_heads, mask, cos, sin, dtype,
                     use_flash=cfg.use_flash_attention,
                     flash_interpret=flash_interpret)
    if cfg.use_fused_conv:
        from ..ops.conv_module import convmod_apply_fused

        # 5x over XLA's depthwise-conv lowering (ops/conv_module.py);
        # shares the interpret flag with the flash kernel.
        x = convmod_apply_fused(p["conv"], x, mask,
                                interpret=flash_interpret)
    else:
        x = L.convmod_apply(p["conv"], x, mask, dtype)
    if cfg.n_experts > 0:
        from .moe import moe_ffn_apply

        # MoE aux loss is surfaced through asr_forward when needed;
        # inference discards it.
        x, _ = moe_ffn_apply(p["ffn2"], x)
    else:
        x = L.ffn_apply(p["ffn2"], x, dtype)
    return L.layernorm_apply(p["ln_out"], x)


def asr_init(key, cfg: PipelineConfig):
    """Initialize the full ASR param pytree."""
    enc = cfg.encoder
    n_mels = cfg.frontend.n_mels
    sub = enc.subsample_factor
    keys = jax.random.split(key, enc.n_layers + 6)
    params = {
        # Frame-stacking subsampler: [B, T, n_mels] -> [B, T/sub, sub*n_mels] @ W
        "subsample": L.dense_init(keys[0], sub * n_mels, enc.d_model),
        "in_ln": L.layernorm_init(enc.d_model),
        "blocks": [
            conformer_block_init(keys[1 + i], enc) for i in range(enc.n_layers)
        ],
        "ctc_head": L.dense_init(keys[enc.n_layers + 1], enc.d_model,
                                 cfg.vocab.vocab_size),
        "lid_head": L.dense_init(keys[enc.n_layers + 2], enc.d_model, N_LANGS),
        "emotion_head": L.dense_init(keys[enc.n_layers + 3], enc.d_model,
                                     N_EMOTIONS),
        "speaker_head": L.dense_init(keys[enc.n_layers + 4], enc.d_model,
                                     SPK_DIM),
    }
    return params


def asr_param_specs(cfg: PipelineConfig):
    """PartitionSpec pytree matching asr_init's output."""
    enc = cfg.encoder
    return {
        "subsample": L.dense_spec(None, "model"),
        "in_ln": L.layernorm_spec(),
        "blocks": [conformer_block_spec(enc) for _ in range(enc.n_layers)],
        "ctc_head": L.dense_spec(None, "model"),
        "lid_head": L.dense_spec(None, "model"),
        "emotion_head": L.dense_spec(None, None),
        "speaker_head": L.dense_spec(None, None),
    }


def subsample_frames(mel: jnp.ndarray, sub: int) -> jnp.ndarray:
    """[B, T, F] -> [B, T//sub, sub*F] by frame stacking (T must be a
    multiple of sub; callers pad)."""
    B, T, F = mel.shape
    return mel.reshape(B, T // sub, sub * F)


def subsampled_mask(mask: jnp.ndarray, sub: int) -> jnp.ndarray:
    """[B, T] -> [B, T//sub]: a stacked frame is valid iff its first source
    frame is valid."""
    B, T = mask.shape
    return mask.reshape(B, T // sub, sub)[:, :, 0]


def asr_forward(params, mel: jnp.ndarray, mask: jnp.ndarray,
                cfg: PipelineConfig, flash_interpret: bool = False):
    """Full forward pass.

    Args:
      params: pytree from asr_init.
      mel:  [B, T, n_mels] float32 log-mel (T a multiple of subsample_factor).
      mask: [B, T] bool, True on valid frames.

    Returns dict with ctc/lid/emotion logits (f32), speaker embeddings
    (L2-normalized, f32) and the subsampled mask [B, T'].
    """
    enc = cfg.encoder
    dtype = jnp.dtype(enc.dtype)
    sub = enc.subsample_factor

    x = subsample_frames(mel, sub)
    m = subsampled_mask(mask, sub)
    x = L.dense_apply(params["subsample"], x, dtype)
    x = L.layernorm_apply(params["in_ln"], x)

    Tp = x.shape[1]
    cos, sin = L.rope_angles(Tp, enc.head_dim)

    block_fn = conformer_block_apply
    if enc.remat:
        # Rematerialize per block: activations are recomputed in the
        # backward pass instead of stored — the standard HBM saver for
        # long-sequence training (config.EncoderConfig.remat).
        block_fn = jax.checkpoint(conformer_block_apply,
                                  static_argnums=(5, 6, 7))
    for blk in params["blocks"]:
        x = block_fn(blk, x, m, cos, sin, enc, dtype,
                     flash_interpret)

    ctc = L.dense_apply(params["ctc_head"], x, dtype)
    lid = L.dense_apply(params["lid_head"], x, dtype)
    emo = L.dense_apply(params["emotion_head"], x, dtype)
    spk = L.dense_apply(params["speaker_head"], x, dtype)
    spk = spk * jax.lax.rsqrt(
        jnp.sum(spk * spk, axis=-1, keepdims=True) + 1e-8)
    return {
        "ctc_logits": ctc,
        "lid_logits": lid,
        "emotion_logits": emo,
        "speaker_embed": spk,
        "encoder_states": x,
        "mask": m,
    }


def param_count(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def activation_specs():
    """PartitionSpecs for forward inputs/outputs: batch over 'data'."""
    return {
        "mel": P("data", None, None),
        "mask": P("data", None),
        "out": {
            "ctc_logits": P("data", None, "model"),
            "lid_logits": P("data", None, "model"),
            "emotion_logits": P("data", None, None),
            "speaker_embed": P("data", None, None),
            "encoder_states": P("data", None, None),
            "mask": P("data", None),
        },
    }
