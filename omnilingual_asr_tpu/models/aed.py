"""AED (attention encoder-decoder) ASR: the second model family.

Where the CTC family (conformer.py) emits frame-synchronous byte posteriors
— ideal for streaming, timestamps, and the segmentation contract — the AED
family decodes bytes autoregressively with cross-attention into the same
conformer encoder (the architecture class of Whisper/LAS). It reuses the
byte decoder from translation.py, so the whole family is a composition:

    log-mel -> conformer encoder -> transformer byte decoder -> text

Use cases: offline highest-accuracy transcription, and joint CTC/AED
training (CTC loss on the encoder + CE on the decoder), the standard recipe
for fast convergence.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..config import PipelineConfig
from .conformer import asr_forward, asr_init, asr_param_specs
from .translation import (
    decoder_forward,
    greedy_translate,
    translator_init,
    translator_specs,
)


def aed_init(key, cfg: PipelineConfig, decoder_layers: int = 4):
    k1, k2 = jax.random.split(key)
    return {
        "encoder": asr_init(k1, cfg),
        "decoder": translator_init(k2, cfg, n_layers=decoder_layers),
    }


def aed_param_specs(cfg: PipelineConfig, decoder_layers: int = 4):
    return {
        "encoder": asr_param_specs(cfg),
        "decoder": translator_specs(n_layers=decoder_layers),
    }


def aed_forward(params, mel: jnp.ndarray, mask: jnp.ndarray,
                tokens: jnp.ndarray, cfg: PipelineConfig) -> Dict[str, jnp.ndarray]:
    """Teacher-forced forward for joint CTC/AED training.

    tokens: [B, Tt] decoder inputs (BOS-shifted byte ids).
    Returns {"ctc_logits", "dec_logits", "mask"}.
    """
    enc_out = asr_forward(params["encoder"], mel, mask, cfg)
    enc = enc_out["encoder_states"]
    dec_logits = decoder_forward(params["decoder"], tokens, enc,
                                 enc_out["mask"], cfg,
                                 n_heads=cfg.encoder.n_heads)
    return {
        "ctc_logits": enc_out["ctc_logits"],
        "dec_logits": dec_logits,
        "mask": enc_out["mask"],
    }


def aed_loss(params, batch: Dict[str, jnp.ndarray], cfg: PipelineConfig,
             ctc_weight: float = 0.3):
    """Joint loss: ctc_weight * CTC + (1-ctc_weight) * label CE.

    batch: mel/mask plus labels [B, L] (byte ids, 0-padded) and
    label_mask [B, L]. Decoder input is the BOS(0)-shifted labels;
    target is labels with EOS(0) at the first pad slot.
    """
    from ..ops.ctc import ctc_loss

    labels = batch["labels"]
    lmask = batch["label_mask"]
    B, L = labels.shape
    bos = jnp.zeros((B, 1), labels.dtype)
    dec_in = jnp.concatenate([bos, labels[:, :-1]], axis=1)

    out = aed_forward(params, batch["mel"], batch["mask"], dec_in, cfg)

    l_ctc = ctc_loss(out["ctc_logits"], out["mask"], labels, lmask,
                     blank_id=cfg.vocab.blank_id)

    # CE target: the label at each position; the first padding position
    # learns EOS(0), later padding is ignored.
    eos_pos = (~lmask) & jnp.concatenate(
        [jnp.ones((B, 1), bool), lmask[:, :-1]], axis=1)
    target = jnp.where(lmask, labels, 0)
    weight = (lmask | eos_pos).astype(jnp.float32)
    logp = jax.nn.log_softmax(out["dec_logits"].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    l_ce = (nll * weight).sum() / jnp.maximum(weight.sum(), 1.0)

    total = ctc_weight * l_ctc + (1.0 - ctc_weight) * l_ce
    return total, {"loss": total, "ctc": l_ctc, "ce": l_ce}


def aed_greedy_decode(params, mel: jnp.ndarray, mask: jnp.ndarray,
                      cfg: PipelineConfig, max_len: int = 256) -> jnp.ndarray:
    """Autoregressive greedy decode: [B, max_len] byte ids (0 = EOS)."""
    enc_out = asr_forward(params["encoder"], mel, mask, cfg)
    return greedy_translate(params["decoder"], enc_out["encoder_states"],
                            enc_out["mask"], cfg, max_len=max_len,
                            n_heads=cfg.encoder.n_heads)
