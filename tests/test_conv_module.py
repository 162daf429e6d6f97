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


class TestFusedConvGrad:
    """Kernel forward + XLA-recompute backward (VERDICT r1 #8)."""

    def test_grads_match_xla_twin(self):
        import jax

        from omnilingual_asr_tpu.ops.conv_module import (
            _conv_module_ref,
            fused_conv_module,
        )

        rng = np.random.default_rng(0)
        B, T, D, K = 2, 64, 128, 8
        x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
        mask = np.ones((B, T), bool)
        mask[0, 50:] = False
        mask = jnp.asarray(mask)
        weights = dict(
            ln_scale=jnp.ones(D), ln_bias=jnp.zeros(D),
            pw1=jnp.asarray(rng.standard_normal((D, 2 * D)) * 0.05,
                            jnp.float32),
            dw=jnp.asarray(rng.standard_normal((K, D)) * 0.2, jnp.float32),
            dwln_scale=jnp.ones(D), dwln_bias=jnp.zeros(D),
            pw2=jnp.asarray(rng.standard_normal((D, D)) * 0.05, jnp.float32),
        )
        order = ["ln_scale", "ln_bias", "pw1", "dw", "dwln_scale",
                 "dwln_bias", "pw2"]

        def loss_fused(x, ws):
            out = fused_conv_module(x, mask, *[ws[k] for k in order],
                                    interpret=True)
            return jnp.sum(out ** 2)

        def loss_ref(x, ws):
            out = _conv_module_ref(x, mask, *[ws[k] for k in order])
            return jnp.sum(out ** 2)

        gx_f, gw_f = jax.grad(loss_fused, (0, 1))(x, weights)
        gx_r, gw_r = jax.grad(loss_ref, (0, 1))(x, weights)
        # forward kernel ~= twin (bf16 matmuls), backward == vjp(twin):
        # grads agree to kernel-vs-twin forward tolerance
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   atol=2e-2, rtol=2e-2)
        for k in order:
            np.testing.assert_allclose(
                np.asarray(gw_f[k]), np.asarray(gw_r[k]),
                atol=2e-2, rtol=2e-2, err_msg=k)
