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


class TestMoEConformer:
    def test_moe_encoder_forward_and_train(self, rng):
        """n_experts>0 swaps each block's second FFN for a sharded MoE; the
        full forward and a train step run on a dp x tp mesh."""
        import dataclasses

        from omnilingual_asr_tpu.config import tiny_config
        from omnilingual_asr_tpu.models.conformer import (
            asr_forward,
            asr_init,
            asr_param_specs,
        )
        from omnilingual_asr_tpu.train.step import make_optimizer, make_train_step

        cfg = tiny_config()
        cfg = cfg.replace(
            encoder=dataclasses.replace(cfg.encoder, n_experts=4),
            mesh=MeshConfig(data=2, model=2))
        params = asr_init(jax.random.PRNGKey(0), cfg)
        assert "router" in params["blocks"][0]["ffn2"]

        mesh = build_mesh(cfg.mesh)
        sharded = shard_params(params, asr_param_specs(cfg), mesh)
        x = jnp.asarray(rng.standard_normal((2, 64, cfg.frontend.n_mels)),
                        jnp.float32)
        mask = jnp.ones((2, 64), bool)
        out = jax.jit(lambda p, m, k: asr_forward(p, m, k, cfg))(
            sharded, x, mask)
        assert np.isfinite(np.asarray(out["ctc_logits"],
                                      dtype=np.float32)).all()

        init_state, train_step = make_train_step(
            cfg, mesh, tx=make_optimizer(lr=1e-3, warmup_steps=2))
        state = init_state(seed=0)
        batch = {
            "mel": x, "mask": mask,
            "labels": jnp.asarray(rng.integers(1, 257, (2, 8)), jnp.int32),
            "label_mask": jnp.ones((2, 8), bool),
            "lid_label": jnp.zeros((2,), jnp.int32),
            "emotion_label": jnp.zeros((2,), jnp.int32),
        }
        params2, opt_state, step, metrics = train_step(
            state.params, state.opt_state, batch, state.step)
        assert np.isfinite(float(metrics["loss"]))


class TestMoEAllToAllDispatch:
    def test_alltoall_matches_dense_in_conformer(self, rng):
        """moe_dispatch='alltoall' routes the conformer's MoE FFN through
        the capacity-based all-to-all (parallel/expert_dispatch.py) on a
        dp x ep mesh and matches the dense dispatch at generous capacity."""
        import dataclasses

        from omnilingual_asr_tpu.config import tiny_config
        from omnilingual_asr_tpu.models.conformer import (
            asr_forward,
            asr_init,
            asr_param_specs,
        )

        cfg = tiny_config()
        cfg = cfg.replace(
            encoder=dataclasses.replace(cfg.encoder, n_experts=8),
            mesh=MeshConfig(data=2, model=4))
        params = asr_init(jax.random.PRNGKey(1), cfg)
        mesh = build_mesh(cfg.mesh)
        sharded = shard_params(params, asr_param_specs(cfg), mesh)
        x = jnp.asarray(rng.standard_normal((4, 64, cfg.frontend.n_mels)),
                        jnp.float32)
        mask = jnp.ones((4, 64), bool)
        data_shard = NamedSharding(mesh, P("data", None, None))
        x = jax.device_put(x, data_shard)

        dense = jax.jit(lambda p, m, k: asr_forward(p, m, k, cfg))(
            sharded, x, mask)

        cfg_ep = cfg.replace(encoder=dataclasses.replace(
            cfg.encoder, n_experts=8, moe_dispatch="alltoall",
            moe_capacity_factor=16.0))  # nothing drops -> exact match
        ep = jax.jit(lambda p, m, k: asr_forward(p, m, k, cfg_ep,
                                                 mesh=mesh))(
            sharded, x, mask)

        np.testing.assert_allclose(
            np.asarray(ep["ctc_logits"], np.float32),
            np.asarray(dense["ctc_logits"], np.float32),
            atol=5e-2, rtol=5e-2)
        np.testing.assert_allclose(
            np.asarray(ep["encoder_states"], np.float32),
            np.asarray(dense["encoder_states"], np.float32),
            atol=2e-2, rtol=5e-2)

    def test_moe_aux_reaches_training_loss(self, rng):
        """The Switch load-balance aux is surfaced via out['moe_aux'] and
        added to the joint loss when n_experts > 0."""
        import dataclasses

        from omnilingual_asr_tpu.config import tiny_config
        from omnilingual_asr_tpu.models.conformer import asr_forward, asr_init
        from omnilingual_asr_tpu.train.step import loss_fn

        cfg = tiny_config()
        cfg = cfg.replace(encoder=dataclasses.replace(cfg.encoder,
                                                      n_experts=4))
        params = asr_init(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.standard_normal((2, 32, cfg.frontend.n_mels)),
                        jnp.float32)
        mask = jnp.ones((2, 32), bool)
        out = asr_forward(params, x, mask, cfg)
        aux = float(out["moe_aux"])
        assert aux > 0.0  # ~n_layers when balanced

        batch = {
            "mel": x, "mask": mask,
            "labels": jnp.asarray(np.full((2, 4), 5), jnp.int32),
            "label_mask": jnp.ones((2, 4), bool),
            "lid_label": jnp.zeros((2,), jnp.int32),
            "emotion_label": jnp.zeros((2,), jnp.int32),
        }
        total, metrics = loss_fn(params, batch, cfg)
        assert "moe_aux" in metrics
        assert np.isfinite(float(total))
