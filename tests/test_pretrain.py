"""BEST-RQ pretraining tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnilingual_asr_tpu.config import MeshConfig, tiny_config
from omnilingual_asr_tpu.parallel.mesh import build_mesh
from omnilingual_asr_tpu.train.pretrain import (
    PretrainConfig,
    make_pretrain_step,
    make_quantizer,
    make_span_mask,
    quantize_targets,
)

PCFG = PretrainConfig(codebook_size=512, codebook_dim=8, mask_prob=0.1,
                      mask_span=3)


class TestQuantizer:
    def test_targets_deterministic_and_diverse(self, rng):
        cfg = tiny_config()
        q = make_quantizer(jax.random.PRNGKey(0), cfg, PCFG)
        mel = jnp.asarray(rng.standard_normal((2, 64, cfg.frontend.n_mels)),
                          jnp.float32)
        t1 = quantize_targets(q, mel, cfg.encoder.subsample_factor)
        t2 = quantize_targets(q, mel, cfg.encoder.subsample_factor)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        assert t1.shape == (2, 16)
        # random features should spread over many codes
        assert len(np.unique(np.asarray(t1))) > 4

    def test_targets_content_dependent(self, rng):
        cfg = tiny_config()
        q = make_quantizer(jax.random.PRNGKey(0), cfg, PCFG)
        a = jnp.asarray(rng.standard_normal((1, 64, cfg.frontend.n_mels)),
                        jnp.float32)
        b = a + 1.5 * jnp.asarray(
            rng.standard_normal(a.shape), jnp.float32)
        ta = quantize_targets(q, a, cfg.encoder.subsample_factor)
        tb = quantize_targets(q, b, cfg.encoder.subsample_factor)
        assert (np.asarray(ta) != np.asarray(tb)).any()


class TestMasking:
    def test_span_mask_rate(self):
        m = make_span_mask(jax.random.PRNGKey(0), 8, 500, PCFG)
        rate = float(jnp.mean(m))
        # ~ mask_prob * span (with overlap shrinkage)
        assert 0.1 < rate < 0.35, rate


class TestPretrainStep:
    def test_loss_decreases_and_acc_rises(self, rng):
        from omnilingual_asr_tpu.train.step import make_optimizer

        cfg = tiny_config().replace(mesh=MeshConfig(data=2, model=1))
        mesh = build_mesh(cfg.mesh)
        init_state, step_fn = make_pretrain_step(
            cfg, mesh, PCFG, tx=make_optimizer(lr=3e-3, warmup_steps=2))
        params, quantizer, opt_state = init_state(seed=0)
        batch = {
            "mel": jnp.asarray(rng.standard_normal(
                (2, 64, cfg.frontend.n_mels)), jnp.float32),
            "mask": jnp.ones((2, 64), bool),
        }
        step = jnp.zeros((), jnp.int32)
        losses, accs = [], []
        for _ in range(10):
            params, opt_state, step, metrics = step_fn(
                params, quantizer, opt_state, batch, step)
            losses.append(float(metrics["loss"]))
            accs.append(float(metrics["masked_acc"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses
        assert accs[-1] >= accs[0]

    def test_encoder_params_compatible_with_supervised(self):
        """Pretrained encoder pytree slots straight into the ASR model."""
        from omnilingual_asr_tpu.models.conformer import asr_init
        from omnilingual_asr_tpu.train.pretrain import pretrain_init

        cfg = tiny_config()
        pre = pretrain_init(jax.random.PRNGKey(0), cfg, PCFG)
        sup = asr_init(jax.random.PRNGKey(1), cfg)
        assert jax.tree.structure(pre["encoder"]) == jax.tree.structure(sup)


class TestPretrainCLI:
    def test_real_crop_sampler_draws(self):
        """Real-audio crops: every unique bundled recording is usable,
        crops are window-sized, finite, and gettysburg's held-out tail is
        excluded from the sampled material."""
        from omnilingual_asr_tpu.train.pretrain_cli import RealCropSampler

        s = RealCropSampler(window_samples=16000, seed=0)
        if not s:
            pytest.skip("no real recordings on this box")
        assert len(s.recs) >= 1
        for _ in range(4):
            crop, n = s.draw()
            assert crop.shape == (16000,)
            assert 0 < n <= 16000
            assert np.isfinite(crop).all()
            assert np.abs(crop).max() <= 1.0 + 1e-6

    @pytest.mark.slow
    def test_pretrain_main_tiny_runs_and_saves(self, tmp_path):
        from omnilingual_asr_tpu.config import MeshConfig, tiny_config
        from omnilingual_asr_tpu.train.pretrain_cli import pretrain_main

        cfg = tiny_config().replace(mesh=MeshConfig(data=1, model=1))
        ck = tmp_path / "bestrq"
        pretrain_main(steps=2, batch_size=2, cfg=cfg, window_seconds=1.0,
                      real_fraction=0.5, ckpt_dir=str(ck), save_every=2,
                      warmup_steps=1)
        assert (ck / "last" / "asr").exists()
        assert (ck / "last" / "train_state.npz").exists()
        # the saved encoder warm-starts supervised training
        from omnilingual_asr_tpu.models.zoo import load_checkpoint

        enc = load_checkpoint(ck / "last" / "asr", cfg)
        assert enc is not None
