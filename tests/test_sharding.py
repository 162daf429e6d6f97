"""Multi-chip sharding tests on the 8-device CPU mesh (SURVEY §4 point 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from omnilingual_asr_tpu.config import MeshConfig, tiny_config
from omnilingual_asr_tpu.models.conformer import (
    asr_forward,
    asr_init,
    asr_param_specs,
)
from omnilingual_asr_tpu.parallel.mesh import build_mesh, shard_params


def _batch(cfg, B=8, T=256, L=16):
    rng = np.random.default_rng(0)
    return {
        "mel": jnp.asarray(rng.standard_normal(
            (B, T, cfg.frontend.n_mels)), jnp.float32),
        "mask": jnp.ones((B, T), bool),
        "labels": jnp.asarray(rng.integers(1, 257, (B, L)), jnp.int32),
        "label_mask": jnp.ones((B, L), bool),
        "lid_label": jnp.zeros((B,), jnp.int32),
        "emotion_label": jnp.zeros((B,), jnp.int32),
    }


class TestMesh:
    def test_mesh_shapes(self):
        mesh = build_mesh(MeshConfig(data=4, model=2))
        assert dict(mesh.shape) == {"data": 4, "model": 2}

    def test_mesh_default_uses_all(self):
        mesh = build_mesh(MeshConfig())
        assert mesh.devices.size == len(jax.devices())

    def test_param_placement(self):
        cfg = tiny_config().replace(mesh=MeshConfig(data=4, model=2))
        mesh = build_mesh(cfg.mesh)
        params = asr_init(jax.random.PRNGKey(0), cfg)
        sharded = shard_params(params, asr_param_specs(cfg), mesh)
        # An FFN w1 is sharded on its output dim over 'model'.
        w1 = sharded["blocks"][0]["ffn1"]["w1"]["w"]
        assert w1.sharding.spec == P(None, "model")
        # LayerNorm scale replicated.
        ln = sharded["in_ln"]["scale"]
        assert ln.sharding.spec == P(None)


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
class TestTrainStep:
    def test_one_step(self, dp, tp):
        from omnilingual_asr_tpu.train.step import make_train_step

        cfg = tiny_config().replace(mesh=MeshConfig(data=dp, model=tp))
        mesh = build_mesh(cfg.mesh)
        init_state, train_step = make_train_step(cfg, mesh)
        state = init_state(seed=0)
        batch = _batch(cfg)
        params, opt_state, step, metrics = train_step(
            state.params, state.opt_state, batch, state.step)
        assert int(step) == 1
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["ctc"]))


class TestTPEquivalence:
    def test_forward_matches_across_mesh_shapes(self):
        """The same params must produce the same outputs under pure DP and
        under TP sharding (GSPMD correctness check)."""
        cfg = tiny_config()
        params = asr_init(jax.random.PRNGKey(0), cfg)
        batch = _batch(cfg, B=4, T=128)

        outs = {}
        for dp, tp in [(4, 1), (2, 2)]:
            c = cfg.replace(mesh=MeshConfig(data=dp, model=tp))
            mesh = build_mesh(c.mesh)
            p = shard_params(params, asr_param_specs(c), mesh)

            fwd = jax.jit(lambda pr, m, k: asr_forward(pr, m, k, c))
            o = fwd(p, batch["mel"], batch["mask"])
            outs[(dp, tp)] = np.asarray(o["ctc_logits"], dtype=np.float32)

        np.testing.assert_allclose(outs[(4, 1)], outs[(2, 2)],
                                   atol=2e-2, rtol=2e-2)


class TestGraftEntry:
    def test_entry_compiles(self):
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "graft_entry", Path(__file__).parents[1] / "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        assert out["ctc_logits"].shape[0] == args[1].shape[0]

    def test_dryrun_multichip(self, capsys):
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "graft_entry2", Path(__file__).parents[1] / "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)
        assert "dryrun_multichip OK" in capsys.readouterr().out
