"""Training-time dropout hook (models/conformer.asr_forward dropout_rng):
off by default, deterministic per rng, actually perturbs the forward."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from omnilingual_asr_tpu.config import tiny_config
from omnilingual_asr_tpu.models.conformer import asr_forward, asr_init


def _setup(dropout: float):
    import dataclasses

    cfg = tiny_config()
    cfg = cfg.replace(encoder=dataclasses.replace(cfg.encoder,
                                                  dropout=dropout))
    params = asr_init(jax.random.PRNGKey(0), cfg)
    B, T = 2, 32
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, T, cfg.frontend.n_mels)), jnp.float32)
    mask = jnp.ones((B, T), bool)
    return cfg, params, mel, mask


def test_no_rng_means_no_dropout():
    cfg, params, mel, mask = _setup(0.5)
    a = asr_forward(params, mel, mask, cfg)
    b = asr_forward(params, mel, mask, cfg, dropout_rng=None)
    np.testing.assert_array_equal(np.asarray(a["ctc_logits"]),
                                  np.asarray(b["ctc_logits"]))


def test_rng_applies_and_is_deterministic():
    cfg, params, mel, mask = _setup(0.3)
    clean = asr_forward(params, mel, mask, cfg)
    k = jax.random.PRNGKey(7)
    d1 = asr_forward(params, mel, mask, cfg, dropout_rng=k)
    d2 = asr_forward(params, mel, mask, cfg, dropout_rng=k)
    d3 = asr_forward(params, mel, mask, cfg,
                     dropout_rng=jax.random.PRNGKey(8))
    # same rng -> identical; different rng -> different; any rng -> differs
    # from the clean forward
    np.testing.assert_array_equal(np.asarray(d1["ctc_logits"]),
                                  np.asarray(d2["ctc_logits"]))
    assert not np.allclose(np.asarray(d1["ctc_logits"]),
                           np.asarray(clean["ctc_logits"]))
    assert not np.allclose(np.asarray(d1["ctc_logits"]),
                           np.asarray(d3["ctc_logits"]))


def test_zero_rate_with_rng_is_identity():
    cfg, params, mel, mask = _setup(0.0)
    a = asr_forward(params, mel, mask, cfg)
    b = asr_forward(params, mel, mask, cfg,
                    dropout_rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(a["ctc_logits"]),
                                  np.asarray(b["ctc_logits"]))
