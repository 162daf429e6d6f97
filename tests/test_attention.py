"""Flash attention kernel vs plain-XLA reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from omnilingual_asr_tpu.ops.attention import (
    BLOCK_Q,
    flash_attention,
    reference_attention,
)


def make_qkv(rng, B=2, T=512, H=4, D=64):
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    return q, k, v


class TestFlashAttention:
    def test_matches_reference_full_mask(self, rng):
        q, k, v = make_qkv(rng)
        mask = jnp.ones((2, 512), bool)
        got = np.asarray(flash_attention(q, k, v, mask, interpret=True))
        want = np.asarray(reference_attention(q, k, v, mask))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_matches_reference_ragged_mask(self, rng):
        q, k, v = make_qkv(rng)
        mask = np.zeros((2, 512), bool)
        mask[0, :300] = True
        mask[1, :512] = True
        got = np.asarray(flash_attention(q, k, v, jnp.asarray(mask),
                                         interpret=True))
        want = np.asarray(reference_attention(q, k, v, jnp.asarray(mask)))
        # only compare valid query rows (masked-out queries are undefined
        # in the reference too — they attend to the same keys though)
        np.testing.assert_allclose(got[0, :], want[0, :], atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(got[1], want[1], atol=2e-5, rtol=1e-4)

    def test_fully_masked_batch_is_finite(self, rng):
        q, k, v = make_qkv(rng, B=1, T=BLOCK_Q)
        mask = jnp.zeros((1, BLOCK_Q), bool)
        got = np.asarray(flash_attention(q, k, v, mask, interpret=True))
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, 0.0, atol=1e-6)

    def test_bf16_inputs(self, rng):
        q, k, v = make_qkv(rng, B=1, T=256, H=2, D=128)
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        mask = jnp.ones((1, 256), bool)
        got = np.asarray(flash_attention(q, k, v, mask, interpret=True),
                         dtype=np.float32)
        want = np.asarray(reference_attention(q, k, v, mask))
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)

    def test_long_sequence(self, rng):
        q, k, v = make_qkv(rng, B=1, T=2048, H=1, D=64)
        mask = jnp.ones((1, 2048), bool)
        got = np.asarray(flash_attention(q, k, v, mask, interpret=True))
        want = np.asarray(reference_attention(q, k, v, mask))
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)
