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


class TestFlashAttentionGrad:
    """Custom Pallas VJP vs grads of the XLA reference (VERDICT r1 #8)."""

    def _loss_pair(self, mask):
        import jax

        def loss_flash(q, k, v):
            out = flash_attention(q, k, v, mask, interpret=True)
            return jnp.sum(jnp.sin(out.astype(jnp.float32)))

        def loss_ref(q, k, v):
            # the mask is KEY validity: every query row is computed, so the
            # plain reference loss matches (fully-masked key sets are the
            # only divergence and are tested separately)
            out = reference_attention(q, k, v, mask)
            return jnp.sum(jnp.sin(out))

        return jax.grad(loss_flash, (0, 1, 2)), jax.grad(loss_ref, (0, 1, 2))

    def test_grads_match_reference_full_mask(self, rng):
        import jax

        q, k, v = make_qkv(rng, B=1, T=512, H=2, D=64)
        mask = jnp.ones((1, 512), bool)
        gf, gr = self._loss_pair(mask)
        got = gf(q, k, v)
        want = gr(q, k, v)
        for g, w, name in zip(got, want, "qkv"):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=3e-4, rtol=1e-3, err_msg=name)

    def test_grads_match_reference_ragged_mask(self, rng):
        q, k, v = make_qkv(rng, B=2, T=512, H=2, D=64)
        mask = np.zeros((2, 512), bool)
        mask[0, :280] = True
        mask[1, :] = True
        mask = jnp.asarray(mask)
        gf, gr = self._loss_pair(mask)
        got = gf(q, k, v)
        want = gr(q, k, v)
        for g, w, name in zip(got, want, "qkv"):
            g, w = np.asarray(g), np.asarray(w)
            assert np.isfinite(g).all(), name
            np.testing.assert_allclose(g, w, atol=3e-4, rtol=1e-3,
                                       err_msg=name)
        # masked keys receive no gradient
        assert np.abs(np.asarray(got[1])[0, 280:]).max() == 0.0
        assert np.abs(np.asarray(got[2])[0, 280:]).max() == 0.0

    def test_fully_masked_batch_grads_finite(self, rng):
        import jax

        q, k, v = make_qkv(rng, B=1, T=256, H=2, D=64)
        mask = jnp.zeros((1, 256), bool)

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, mask,
                                           interpret=True) ** 2)

        gq, gk, gv = jax.grad(loss, (0, 1, 2))(q, k, v)
        for g in (gq, gk, gv):
            g = np.asarray(g)
            assert np.isfinite(g).all()
            assert np.abs(g).max() == 0.0  # zero output, zero grads
