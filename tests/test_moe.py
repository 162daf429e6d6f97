"""MoE FFN / expert-parallelism tests."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from omnilingual_asr_tpu.config import MeshConfig
from omnilingual_asr_tpu.models.moe import (
    moe_ffn_apply,
    moe_ffn_init,
    moe_ffn_spec,
)
from omnilingual_asr_tpu.parallel.mesh import build_mesh, shard_params


def setup(E=4, D=64, mult=2):
    params = moe_ffn_init(jax.random.PRNGKey(0), D, E, mult)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, D)), jnp.float32)
    return params, x


class TestMoE:
    def test_forward_shapes_and_aux(self):
        params, x = setup()
        y, aux = moe_ffn_apply(params, x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()
        # balanced-ish routing at init: aux near 1, bounded by E
        assert 0.5 < float(aux) <= 4.0

    def test_differentiable(self):
        params, x = setup()

        def loss(p):
            y, aux = moe_ffn_apply(p, x)
            return jnp.sum(y ** 2) + 0.01 * aux

        grads = jax.grad(loss)(params)
        gnorm = sum(float(jnp.sum(g * g)) for g in jax.tree.leaves(grads))
        assert np.isfinite(gnorm) and gnorm > 0
        # router receives gradient (through the gate)
        assert float(jnp.sum(grads["router"]["w"] ** 2)) > 0

    def test_expert_sharding_over_model_axis(self):
        mesh = build_mesh(MeshConfig(data=2, model=4))
        params, x = setup(E=4)
        sharded = shard_params(params, moe_ffn_spec(), mesh)
        assert sharded["w1"].sharding.spec == P("model", None, None)

        fwd = jax.jit(lambda p, x: moe_ffn_apply(p, x)[0],
                      in_shardings=(
                          jax.tree.map(lambda s: NamedSharding(mesh, s),
                                       moe_ffn_spec(),
                                       is_leaf=lambda v: isinstance(v, P)),
                          NamedSharding(mesh, P("data", None, None))))
        y = fwd(sharded, x)
        # sharded result matches single-device reference
        want = moe_ffn_apply(params, x)[0]
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   atol=2e-2, rtol=2e-2)

    def test_routing_selects_different_experts(self):
        params, x = setup(E=8)
        h = x  # router over LN(x); just check top-1 distribution spread
        from omnilingual_asr_tpu.models import layers as L

        logits = L.dense_apply(params["router"],
                               L.layernorm_apply(params["ln"], x))
        top = np.asarray(jnp.argmax(logits, axis=-1)).ravel()
        assert len(np.unique(top)) >= 2
