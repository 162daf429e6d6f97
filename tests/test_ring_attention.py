"""Ring (sequence-parallel) attention vs full attention, on the 8-device
CPU mesh with real ppermute collectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnilingual_asr_tpu.config import MeshConfig
from omnilingual_asr_tpu.ops.attention import reference_attention
from omnilingual_asr_tpu.ops.ring_attention import ring_attention
from omnilingual_asr_tpu.parallel.mesh import build_mesh


def make_qkv(rng, B=1, T=1024, H=2, D=64):
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    return q, k, v


class TestRingAttention:
    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_matches_full_attention(self, rng, n_dev):
        mesh = build_mesh(MeshConfig(data=n_dev, model=1),
                          devices=jax.devices()[:n_dev])
        q, k, v = make_qkv(rng)
        mask = jnp.ones((1, 1024), bool)
        got = np.asarray(ring_attention(q, k, v, mask, mesh))
        want = np.asarray(reference_attention(q, k, v, mask))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_ragged_mask(self, rng):
        mesh = build_mesh(MeshConfig(data=8, model=1))
        q, k, v = make_qkv(rng)
        mask = np.zeros((1, 1024), bool)
        mask[0, :700] = True   # valid keys end mid-shard
        got = np.asarray(ring_attention(q, k, v, jnp.asarray(mask), mesh))
        want = np.asarray(reference_attention(q, k, v, jnp.asarray(mask)))
        np.testing.assert_allclose(got[0, :700], want[0, :700],
                                   atol=2e-5, rtol=1e-4)

    def test_long_sequence_low_memory_path(self, rng):
        """9.5h-mode smoke test: T=4096 over 8 chips = 512 keys resident per
        chip per step."""
        mesh = build_mesh(MeshConfig(data=8, model=1))
        q, k, v = make_qkv(rng, T=4096, H=1, D=64)
        mask = jnp.ones((1, 4096), bool)
        got = np.asarray(ring_attention(q, k, v, mask, mesh))
        want = np.asarray(reference_attention(q, k, v, mask))
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)
