"""All-to-all expert dispatch vs dense MoE reference."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from omnilingual_asr_tpu.models.moe import moe_ffn_apply, moe_ffn_init
from omnilingual_asr_tpu.parallel.expert_dispatch import ep_moe_apply


def expert_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("model",))


def setup(E=8, D=64, N=64, mult=2, seed=0):
    params = moe_ffn_init(jax.random.PRNGKey(seed), D, E, mult)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    return params, x


class TestExpertDispatch:
    def test_matches_dense_moe(self):
        params, x = setup()
        mesh = expert_mesh(4)
        # generous capacity: nothing drops -> must match the dense version
        got = np.asarray(ep_moe_apply(params, x, mesh, capacity_factor=8.0))
        want, _ = moe_ffn_apply(params, x[None], dtype=jnp.float32)
        np.testing.assert_allclose(got, np.asarray(want)[0],
                                   atol=2e-4, rtol=1e-3)

    def test_eight_devices(self):
        params, x = setup(E=8, N=128)
        mesh = expert_mesh(8)
        got = np.asarray(ep_moe_apply(params, x, mesh, capacity_factor=8.0))
        want, _ = moe_ffn_apply(params, x[None], dtype=jnp.float32)
        np.testing.assert_allclose(got, np.asarray(want)[0],
                                   atol=2e-4, rtol=1e-3)

    def test_capacity_overflow_falls_through(self):
        """With capacity 0-ish, dropped tokens keep the residual value."""
        params, x = setup(N=64)
        mesh = expert_mesh(4)
        out = np.asarray(ep_moe_apply(params, x, mesh,
                                      capacity_factor=0.01))
        # capacity 1 per (src,dst): most tokens fall through unchanged
        same = np.isclose(out, np.asarray(x), atol=1e-6).all(axis=1).mean()
        assert same > 0.3
        assert np.isfinite(out).all()
