"""Fused conv-module kernel vs the XLA reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from omnilingual_asr_tpu.config import tiny_config
from omnilingual_asr_tpu.models import layers as L
from omnilingual_asr_tpu.ops.conv_module import convmod_apply_fused


def setup(B=2, T=256, D=128, K=8):
    p = L.convmod_init(jax.random.PRNGKey(0), D, K)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    mask = jnp.ones((B, T), bool)
    return p, x, mask


class TestFusedConvModule:
    def test_matches_reference(self):
        p, x, mask = setup()
        got = np.asarray(convmod_apply_fused(p, x, mask, interpret=True))
        want = np.asarray(L.convmod_apply(p, x, mask))
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)

    def test_ragged_mask(self):
        p, x, mask = setup()
        m = np.array(mask)  # writable copy
        m[0, 100:] = False
        m = jnp.asarray(m)
        got = np.asarray(convmod_apply_fused(p, x, m, interpret=True))
        want = np.asarray(L.convmod_apply(p, x, m))
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)

    def test_odd_kernel_size(self):
        p, x, mask = setup(K=15)
        got = np.asarray(convmod_apply_fused(p, x, mask, interpret=True))
        want = np.asarray(L.convmod_apply(p, x, mask))
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)
