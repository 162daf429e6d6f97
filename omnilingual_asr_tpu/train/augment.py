"""SpecAugment: time and frequency masking on log-mel batches.

Standard ASR training augmentation (Park et al. 2019). Runs inside the
jitted train step on device — pure jnp ops on the mel tensor, driven by a
jax PRNG key so every step sees fresh masks.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SpecAugmentConfig:
    n_freq_masks: int = 2
    freq_mask_width: int = 20     # mel bins
    n_time_masks: int = 2
    time_mask_width: int = 60     # frames (~0.6 s at 10 ms hop)


def spec_augment(key: jax.Array, mel: jnp.ndarray, mask: jnp.ndarray,
                 cfg: SpecAugmentConfig = SpecAugmentConfig()) -> jnp.ndarray:
    """Apply SpecAugment to a batch.

    mel: [B, T, F]; mask: [B, T] valid-frame mask (time masks are drawn
    within the valid span). Masked regions are set to the per-utterance
    mean (gentler than zeroing for log-domain features).
    """
    B, T, F = mel.shape
    mean = (mel * mask[:, :, None]).sum(axis=(1, 2), keepdims=True) / \
        jnp.maximum(mask.sum(axis=1)[:, None, None] * F, 1.0)

    out = mel
    keys = jax.random.split(key, cfg.n_freq_masks + cfg.n_time_masks)
    k_i = 0

    freq_idx = jnp.arange(F)[None, None, :]
    for _ in range(cfg.n_freq_masks):
        k1, k2 = jax.random.split(keys[k_i]); k_i += 1
        width = jax.random.randint(k1, (B, 1, 1), 0, cfg.freq_mask_width + 1)
        start = jax.random.randint(k2, (B, 1, 1), 0, jnp.maximum(F - cfg.freq_mask_width, 1))
        hit = (freq_idx >= start) & (freq_idx < start + width)
        out = jnp.where(hit, mean, out)

    time_idx = jnp.arange(T)[None, :, None]
    n_valid = mask.sum(axis=1)[:, None, None]
    for _ in range(cfg.n_time_masks):
        k1, k2 = jax.random.split(keys[k_i]); k_i += 1
        width = jax.random.randint(k1, (B, 1, 1), 0, cfg.time_mask_width + 1)
        lim = jnp.maximum(n_valid - width, 1)
        start = jax.random.randint(k2, (B, 1, 1), 0, T) % lim
        hit = (time_idx >= start) & (time_idx < start + width)
        out = jnp.where(hit, mean, out)
    return out
