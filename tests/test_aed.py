"""AED (encoder-decoder) model family tests."""

import jax
import jax.numpy as jnp
import numpy as np

from omnilingual_asr_tpu.config import tiny_config
from omnilingual_asr_tpu.models.aed import (
    aed_forward,
    aed_greedy_decode,
    aed_init,
    aed_loss,
    aed_param_specs,
)
from omnilingual_asr_tpu.ops.ctc import text_to_byte_labels


def make_batch(cfg, rng, B=2, T=64, L=8):
    labels = np.zeros((B, L), np.int32)
    lmask = np.zeros((B, L), bool)
    for i in range(B):
        labels[i], lmask[i] = text_to_byte_labels("hey", cfg.vocab, L)
    return {
        "mel": jnp.asarray(rng.standard_normal(
            (B, T, cfg.frontend.n_mels)), jnp.float32),
        "mask": jnp.ones((B, T), bool),
        "labels": jnp.asarray(labels),
        "label_mask": jnp.asarray(lmask),
    }


class TestAED:
    def test_forward_shapes(self, rng):
        cfg = tiny_config()
        params = aed_init(jax.random.PRNGKey(0), cfg, decoder_layers=1)
        batch = make_batch(cfg, rng)
        tokens = batch["labels"]
        out = aed_forward(params, batch["mel"], batch["mask"], tokens, cfg)
        B, L = tokens.shape
        assert out["dec_logits"].shape == (B, L, cfg.vocab.vocab_size)
        assert out["ctc_logits"].shape[0] == B

    def test_joint_loss_finite_and_differentiable(self, rng):
        cfg = tiny_config()
        params = aed_init(jax.random.PRNGKey(0), cfg, decoder_layers=1)
        batch = make_batch(cfg, rng)
        (loss, metrics), grads = jax.value_and_grad(
            aed_loss, has_aux=True)(params, batch, cfg)
        assert np.isfinite(float(loss))
        assert np.isfinite(float(metrics["ce"]))
        gnorm = sum(float(jnp.sum(g * g)) for g in jax.tree.leaves(grads))
        assert gnorm > 0

    def test_loss_decreases(self, rng):
        import optax

        cfg = tiny_config()
        params = aed_init(jax.random.PRNGKey(0), cfg, decoder_layers=1)
        batch = make_batch(cfg, rng)
        tx = optax.adam(3e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            (loss, m), grads = jax.value_and_grad(
                aed_loss, has_aux=True)(params, batch, cfg)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for _ in range(6):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses

    def test_greedy_decode_runs(self, rng):
        cfg = tiny_config()
        params = aed_init(jax.random.PRNGKey(0), cfg, decoder_layers=1)
        batch = make_batch(cfg, rng)
        toks = aed_greedy_decode(params, batch["mel"], batch["mask"], cfg,
                                 max_len=12)
        assert toks.shape == (2, 12)
        assert int(toks.max()) <= 256

    def test_param_specs_structure(self):
        cfg = tiny_config()
        params = aed_init(jax.random.PRNGKey(0), cfg, decoder_layers=1)
        specs = aed_param_specs(cfg, decoder_layers=1)
        from jax.sharding import PartitionSpec as P

        pt = jax.tree.structure(params)
        st = jax.tree.structure(specs,
                                is_leaf=lambda x: isinstance(x, P))
        assert pt == st
