"""Self-supervised pretraining: BEST-RQ-style masked prediction.

The omnilingual claim (1600+ languages, reference README.md:96-107) rests on
self-supervised pretraining over unlabeled speech — labels exist for only a
fraction of those languages. This module implements the BEST-RQ recipe
(random-projection quantizer, Chiu et al. 2022), the simplest strong SSL
objective and a natural fit for TPU (no codebook learning, no EMA teacher):

1. a FROZEN random projection + codebook turn each (stacked) mel frame into
   a discrete target id;
2. contiguous spans of the input mel are masked (replaced with noise);
3. the conformer encoder + a linear head predict the target ids at masked
   positions (cross-entropy).

After pretraining, `params["encoder"]` warm-starts the supervised
multi-task training (train/step.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PipelineConfig
from ..models import layers as L
from ..models.conformer import (
    asr_forward,
    asr_init,
    asr_param_specs,
    subsample_frames,
    subsampled_mask,
)
from ..parallel.mesh import shard_params
from .step import make_optimizer


@dataclass(frozen=True)
class PretrainConfig:
    codebook_size: int = 8192
    codebook_dim: int = 16
    mask_prob: float = 0.06       # probability a subsampled frame STARTS a mask
    mask_span: int = 5            # masked span length (subsampled frames)
    noise_scale: float = 0.1


def make_quantizer(key, cfg: PipelineConfig, pcfg: PretrainConfig) -> Dict:
    """Frozen random projection + codebook (never trained)."""
    k1, k2 = jax.random.split(key)
    in_dim = cfg.frontend.n_mels * cfg.encoder.subsample_factor
    proj = jax.random.normal(k1, (in_dim, pcfg.codebook_dim), jnp.float32)
    proj = proj / jnp.linalg.norm(proj, axis=0, keepdims=True)
    codebook = jax.random.normal(k2, (pcfg.codebook_size, pcfg.codebook_dim),
                                 jnp.float32)
    codebook = codebook / jnp.linalg.norm(codebook, axis=1, keepdims=True)
    return {"proj": proj, "codebook": codebook}


def quantize_targets(quantizer: Dict, mel: jnp.ndarray,
                     sub: int) -> jnp.ndarray:
    """Target ids [B, T'] from unmasked mel [B, T, F] (frame stacking
    matches the encoder's subsampler so targets align 1:1 with encoder
    frames)."""
    stacked = subsample_frames(mel, sub)               # [B, T', sub*F]
    # Per-utterance standardization before projection (BEST-RQ detail:
    # keeps the random quantizer balanced across loudness).
    mean = stacked.mean(axis=(1, 2), keepdims=True)
    std = stacked.std(axis=(1, 2), keepdims=True) + 1e-5
    z = (stacked - mean) / std
    v = z @ quantizer["proj"]                          # [B, T', D]
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-9)
    sims = jnp.einsum("btd,cd->btc", v, quantizer["codebook"])
    return jnp.argmax(sims, axis=-1)                   # [B, T']


def make_span_mask(key, B: int, Tp: int, pcfg: PretrainConfig) -> jnp.ndarray:
    """[B, T'] bool — True where the input is masked (span smearing of
    Bernoulli starts)."""
    starts = jax.random.bernoulli(key, pcfg.mask_prob, (B, Tp))
    m = starts
    for s in range(1, pcfg.mask_span):
        m = m | jnp.pad(starts, ((0, 0), (s, 0)))[:, :Tp]
    return m


def pretrain_init(key, cfg: PipelineConfig, pcfg: PretrainConfig):
    k1, k2 = jax.random.split(key)
    return {
        "encoder": asr_init(k1, cfg),
        "head": L.dense_init(k2, cfg.encoder.d_model, pcfg.codebook_size),
    }


def pretrain_param_specs(cfg: PipelineConfig):
    return {
        "encoder": asr_param_specs(cfg),
        "head": L.dense_spec(None, "model"),
    }


def pretrain_loss(params, quantizer, batch, key, cfg: PipelineConfig,
                  pcfg: PretrainConfig):
    """Masked-prediction CE. batch: mel [B,T,F], mask [B,T] (valid)."""
    mel, valid = batch["mel"], batch["mask"]
    sub = cfg.encoder.subsample_factor
    B, T, F = mel.shape
    Tp = T // sub

    targets = quantize_targets(quantizer, mel, sub)     # [B, T']
    k1, k2 = jax.random.split(key)
    span_mask = make_span_mask(k1, B, Tp, pcfg)         # [B, T']
    valid_sub = subsampled_mask(valid, sub)
    span_mask = span_mask & valid_sub

    # Corrupt the input: replace masked frames with gaussian noise.
    frame_mask = jnp.repeat(span_mask, sub, axis=1)[:, :T]  # [B, T]
    noise = pcfg.noise_scale * jax.random.normal(k2, mel.shape, mel.dtype)
    corrupted = jnp.where(frame_mask[:, :, None], noise, mel)

    out = asr_forward(params["encoder"], corrupted, valid, cfg)
    logits = L.dense_apply(params["head"], out["encoder_states"])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    w = span_mask.astype(jnp.float32)
    loss = (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
    acc = ((jnp.argmax(logits, -1) == targets) * w).sum() / jnp.maximum(
        w.sum(), 1.0)
    return loss, {"loss": loss, "masked_acc": acc,
                  "masked_frames": w.sum()}


def make_pretrain_step(cfg: PipelineConfig, mesh: Mesh,
                       pcfg: PretrainConfig = PretrainConfig(),
                       tx: optax.GradientTransformation = None,
                       from_samples: bool = False):
    """from_samples=True: the batch carries a raw sample wire (int16 or
    μ-law uint8, like the supervised path) and the fused log-mel frontend
    runs inside the step's jit — same H2D-byte discipline as
    make_train_step (the tunnel link is the training bottleneck)."""
    tx = tx or make_optimizer(lr=2e-3)
    pspecs = pretrain_param_specs(cfg)
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                            is_leaf=lambda x: isinstance(x, P))
    if from_samples:
        batch_sh = {
            "samples": NamedSharding(mesh, P("data", None)),
            "mask": NamedSharding(mesh, P("data", None)),
        }
        from ..ops.mel_pallas import MelFrontend

        frontend = MelFrontend(cfg.frontend)
    else:
        batch_sh = {
            "mel": NamedSharding(mesh, P("data", None, None)),
            "mask": NamedSharding(mesh, P("data", None)),
        }

    def init_state(seed: int = 0):
        params = pretrain_init(jax.random.PRNGKey(seed), cfg, pcfg)
        params = shard_params(params, pspecs, mesh)
        quantizer = make_quantizer(jax.random.PRNGKey(seed + 1), cfg, pcfg)
        opt_state = jax.jit(tx.init)(params)
        return params, quantizer, opt_state

    @partial(jax.jit, donate_argnums=(0, 2),
             in_shardings=(param_sh, None, None, batch_sh, None))
    def pretrain_step(params, quantizer, opt_state, batch, step):
        if from_samples:
            from .step import _mel_from_samples

            batch = _mel_from_samples(batch, cfg, frontend)
        key = jax.random.fold_in(jax.random.PRNGKey(0), step)
        (_, metrics), grads = jax.value_and_grad(
            pretrain_loss, has_aux=True)(params, quantizer, batch, key,
                                         cfg, pcfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, step + 1, metrics

    return init_state, pretrain_step
