"""Training pipeline tests: loader shapes, loss decreases, checkpoint
roundtrip into the inference engine."""

import json
import wave
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnilingual_asr_tpu.config import MeshConfig, tiny_config
from omnilingual_asr_tpu.parallel.mesh import build_mesh
from omnilingual_asr_tpu.train.data import BatchLoader
from omnilingual_asr_tpu.train.step import make_optimizer, make_train_step


def write_wav(path: Path, seconds: float = 2.0, sr: int = 16000, f0: float = 220.0):
    t = np.arange(int(seconds * sr)) / sr
    x = (np.sin(2 * np.pi * f0 * t) * 12000).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


@pytest.fixture(scope="module")
def manifest(tmp_path_factory):
    d = tmp_path_factory.mktemp("traindata")
    lines = []
    for i in range(6):
        wav = d / f"utt{i}.wav"
        write_wav(wav, seconds=1.0, f0=200 + 30 * i)
        lines.append(json.dumps({
            "audio": wav.name, "text": f"utterance number {i}",
            "language": "en", "emotion": "neutral"}))
    m = d / "manifest.jsonl"
    m.write_text("\n".join(lines) + "\n")
    return m


class TestLoader:
    def test_batch_shapes(self, manifest):
        cfg = tiny_config()
        loader = BatchLoader(manifest, cfg, batch_size=2,
                             window_seconds=2.0, seed=0)
        batch = next(loader)
        loader.close()
        assert batch["samples"].shape == (2, 32000)
        assert batch["mask"].shape[0] == 2
        assert batch["mask"].shape[1] % cfg.encoder.subsample_factor == 0
        assert batch["labels"].shape == (2, 512)
        assert batch["label_mask"].any()
        assert batch["lid_label"].dtype == np.int32

    def test_loader_loops_and_shuffles(self, manifest):
        cfg = tiny_config()
        loader = BatchLoader(manifest, cfg, batch_size=2,
                             window_seconds=1.0, seed=1)
        batches = [next(loader) for _ in range(5)]  # > one epoch (3 batches)
        loader.close()
        assert len(batches) == 5


class TestTrainLoop:
    def test_loss_decreases_from_samples(self, manifest):
        cfg = tiny_config().replace(mesh=MeshConfig(data=2, model=1))
        mesh = build_mesh(cfg.mesh)
        init_state, train_step = make_train_step(
            cfg, mesh, tx=make_optimizer(lr=3e-3, warmup_steps=1),
            from_samples=True)
        state = init_state(seed=0)
        params, opt_state, step = state.params, state.opt_state, state.step
        loader = BatchLoader(manifest, cfg, batch_size=2,
                             window_seconds=1.0, seed=0)
        batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
        loader.close()
        losses = []
        for _ in range(8):  # overfit a single batch
            params, opt_state, step, metrics = train_step(
                params, opt_state, batch, step)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses


class TestCheckpoint:
    def test_save_load_roundtrip_into_engine(self, tmp_path):
        from omnilingual_asr_tpu.engine import TranscriptionEngine
        from omnilingual_asr_tpu.models.conformer import asr_init
        from omnilingual_asr_tpu.models.zoo import load_checkpoint, save_checkpoint

        cfg = tiny_config()
        params = asr_init(jax.random.PRNGKey(42), cfg)
        ckpt = tmp_path / "ckpt"
        save_checkpoint(ckpt, jax.device_get(params))
        restored = load_checkpoint(ckpt, cfg)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # engine honors checkpoint_path
        eng = TranscriptionEngine(
            config=cfg.replace(checkpoint_path=str(ckpt)),
            batch_windows_per_device=1, window_seconds=5.0)
        w = jax.tree.leaves(eng.params)[0]
        np.testing.assert_array_equal(np.asarray(w),
                                      np.asarray(jax.tree.leaves(params)[0]))


class TestSpecAugment:
    def test_masks_applied_within_bounds(self, rng):
        from omnilingual_asr_tpu.train.augment import (
            SpecAugmentConfig,
            spec_augment,
        )

        B, T, F = 2, 200, 128
        mel = jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32)
        mask = jnp.asarray(np.arange(T)[None, :] < np.array([[150], [200]])[:, 0:1])
        mask = jnp.asarray(np.tile(np.arange(T)[None, :], (B, 1)) <
                           np.array([[150], [200]]))
        key = jax.random.PRNGKey(0)
        out = spec_augment(key, mel, mask)
        assert out.shape == mel.shape
        changed = np.asarray(out != mel)
        assert changed.any()            # something was masked
        assert not changed.all()        # not everything

    def test_deterministic_per_key(self, rng):
        from omnilingual_asr_tpu.train.augment import spec_augment

        mel = jnp.asarray(rng.standard_normal((1, 100, 128)), jnp.float32)
        mask = jnp.ones((1, 100), bool)
        a = spec_augment(jax.random.PRNGKey(1), mel, mask)
        b = spec_augment(jax.random.PRNGKey(1), mel, mask)
        c = spec_augment(jax.random.PRNGKey(2), mel, mask)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert (np.asarray(a) != np.asarray(c)).any()

    def test_train_step_with_augment(self, manifest):
        from omnilingual_asr_tpu.train.augment import SpecAugmentConfig
        from omnilingual_asr_tpu.train.data import BatchLoader

        cfg = tiny_config().replace(mesh=MeshConfig(data=1, model=1))
        mesh = build_mesh(cfg.mesh, devices=jax.devices()[:1])
        init_state, train_step = make_train_step(
            cfg, mesh, from_samples=True, augment=SpecAugmentConfig())
        state = init_state(seed=0)
        loader = BatchLoader(manifest, cfg, batch_size=2,
                             window_seconds=1.0, seed=0)
        batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
        loader.close()
        params, opt_state, step, metrics = train_step(
            state.params, state.opt_state, batch, state.step)
        assert np.isfinite(float(metrics["loss"]))


class TestRemat:
    def test_remat_grads_match(self, manifest):
        """jax.checkpoint blocks must not change values or gradients."""
        import dataclasses

        from omnilingual_asr_tpu.models.conformer import asr_init
        from omnilingual_asr_tpu.train.step import loss_fn

        cfg = tiny_config()
        cfg_r = cfg.replace(encoder=dataclasses.replace(cfg.encoder,
                                                        remat=True))
        params = asr_init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        B, T, L = 2, 64, 8
        batch = {
            "mel": jnp.asarray(rng.standard_normal(
                (B, T, cfg.frontend.n_mels)), jnp.float32),
            "mask": jnp.ones((B, T), bool),
            "labels": jnp.asarray(rng.integers(1, 257, (B, L)), jnp.int32),
            "label_mask": jnp.ones((B, L), bool),
            "lid_label": jnp.zeros((B,), jnp.int32),
            "emotion_label": jnp.zeros((B,), jnp.int32),
        }
        g1 = jax.grad(lambda p: loss_fn(p, batch, cfg)[0])(params)
        g2 = jax.grad(lambda p: loss_fn(p, batch, cfg_r)[0])(params)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-3)


class TestTrainCLIFunction:
    def test_train_runs_and_saves_checkpoint(self, manifest, tmp_path):
        from omnilingual_asr_tpu.train.cli import train

        cfg = tiny_config().replace(mesh=MeshConfig(data=1, model=1))
        ckpt = tmp_path / "cli_ckpt"
        params = train(str(manifest), steps=2, batch_size=2, cfg=cfg,
                       window_seconds=1.0, ckpt=str(ckpt), log_every=1)
        assert params is not None
        assert ckpt.exists()
        # checkpoint loads back into the inference engine
        from omnilingual_asr_tpu.models.zoo import load_checkpoint

        restored = load_checkpoint(ckpt, cfg)
        assert jax.tree.structure(restored) == jax.tree.structure(
            jax.device_get(params))


class TestWireFormats:
    def test_mulaw_wire_matches_f32(self, manifest):
        """uint8 mu-law samples through the train step produce (near-)
        identical loss to the f32 wire: the ~38 dB companding floor sits
        below the training noise augmentation."""
        from omnilingual_asr_tpu.audio.codec import mulaw_encode

        cfg = tiny_config().replace(mesh=MeshConfig(data=2, model=1))
        mesh = build_mesh(cfg.mesh)
        init_state, train_step = make_train_step(
            cfg, mesh, tx=make_optimizer(lr=3e-3, warmup_steps=1),
            from_samples=True)
        state = init_state(seed=0)
        loader = BatchLoader(manifest, cfg, batch_size=2,
                             window_seconds=1.0, seed=0)
        batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
        loader.close()
        b_mu = dict(batch)
        b_mu["samples"] = jnp.asarray(
            mulaw_encode(np.asarray(batch["samples"], np.float32)))
        assert b_mu["samples"].dtype == jnp.uint8
        # train_step donates params/opt_state; re-init (same seed ->
        # identical weights) for the second call.
        _, _, _, m_f32 = train_step(state.params, state.opt_state,
                                    batch, state.step)
        state2 = init_state(seed=0)
        _, _, _, m_mu = train_step(state2.params, state2.opt_state,
                                   b_mu, state2.step)
        assert np.isfinite(float(m_mu["loss"]))
        assert abs(float(m_mu["loss"]) - float(m_f32["loss"])) \
            < 0.05 * abs(float(m_f32["loss"])) + 0.05


class TestNaNRobustness:
    def test_aam_grad_finite_at_cos_one(self):
        """ArcFace sqrt edge: when an embedding aligns exactly with its
        class column (cos=1), the loss gradient must stay finite
        (r3_d256x4b divergence: inf grad through sqrt(1-cos^2) at the
        run's sharpest point NaN'd every parameter in one step)."""
        from omnilingual_asr_tpu.train.step import aam_softmax_loss

        D, C = 8, 16
        w = np.zeros((D, C), np.float32)
        w[0, 0] = 1.0
        w[1, 1:] = 1.0
        emb = np.zeros((2, D), np.float32)
        emb[0, 0] = 1.0          # exactly the class-0 column: cos = 1.0
        emb[1, 0] = -1.0         # anti-aligned: cos = -1.0
        grad = jax.grad(
            lambda e: aam_softmax_loss(e, jnp.array([0, 0]), jnp.asarray(w))
        )(jnp.asarray(emb))
        assert bool(jnp.isfinite(grad).all()), np.asarray(grad)

    def test_optimizer_skips_nonfinite_update(self):
        from omnilingual_asr_tpu.train.step import make_optimizer

        tx = make_optimizer(lr=1e-3, warmup_steps=1, decay_steps=10)
        params = {"w": jnp.ones((4,))}
        st = tx.init(params)
        for bad in (jnp.inf, jnp.nan):
            g = {"w": jnp.array([1.0, bad, 1.0, 1.0])}
            upd, st = tx.update(g, st, params)
            import optax

            params = optax.apply_updates(params, upd)
            assert bool(jnp.isfinite(params["w"]).all()), (bad, params)


class TestTrainStateResume:
    """Full train-state checkpointing (round-4): segmented runs must resume
    the optimizer moments and lr-schedule position, not just params — the
    measured 'post-resume bounce' cost the d512 rung its quality."""

    def test_train_state_roundtrip(self, manifest, tmp_path):
        from omnilingual_asr_tpu.train.synth_train import (
            load_train_state, save_train_state)

        cfg = tiny_config().replace(mesh=MeshConfig(data=1, model=1))
        mesh = build_mesh(cfg.mesh)
        init_state, train_step = make_train_step(
            cfg, mesh, tx=make_optimizer(lr=3e-3, warmup_steps=1),
            from_samples=True)
        state = init_state(seed=0)
        loader = BatchLoader(manifest, cfg, batch_size=2,
                             window_seconds=1.0, seed=0)
        batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
        loader.close()
        params, opt_state, step, _ = train_step(
            state.params, state.opt_state, batch, state.step)
        want = [np.asarray(x) for x in jax.tree.leaves(
            jax.device_get(opt_state))]
        p = tmp_path / "train_state.npz"
        save_train_state(p, opt_state, 17, 0.123)
        template = init_state(seed=1).opt_state   # fresh moments, same tree
        restored, got_step, got_best = load_train_state(p, template)
        assert got_step == 17 and abs(got_best - 0.123) < 1e-9
        got = [np.asarray(x) for x in jax.tree.leaves(
            jax.device_get(restored))]
        assert len(got) == len(want)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)

    def test_train_state_rejects_mismatched_model(self, manifest, tmp_path):
        import dataclasses as dc

        from omnilingual_asr_tpu.train.synth_train import (
            load_train_state, save_train_state)

        cfg = tiny_config().replace(mesh=MeshConfig(data=1, model=1))
        mesh = build_mesh(cfg.mesh)
        init_state, _ = make_train_step(
            cfg, mesh, tx=make_optimizer(lr=3e-3, warmup_steps=1),
            from_samples=True)
        p = tmp_path / "train_state.npz"
        save_train_state(p, init_state(seed=0).opt_state, 5, 1.0)
        cfg2 = cfg.replace(encoder=dc.replace(cfg.encoder,
                                              d_model=cfg.encoder.d_model * 2))
        init2, _ = make_train_step(
            cfg2, mesh, tx=make_optimizer(lr=3e-3, warmup_steps=1),
            from_samples=True)
        with pytest.raises(ValueError):
            load_train_state(p, init2(seed=0).opt_state)

    @pytest.mark.slow
    def test_segmented_run_resumes_step_and_schedule(self, tmp_path):
        """Two 2-step segments with --total-steps 4 behave as one 4-step
        run: the second segment starts at global step 2 and train_state
        records step 4 at the end."""
        from omnilingual_asr_tpu.train.synth_train import train_synth

        cfg = tiny_config().replace(mesh=MeshConfig(data=1, model=1))
        ck = tmp_path / "seg"
        train_synth(steps=2, batch_size=2, cfg=cfg, window_seconds=1.0,
                    ckpt_dir=str(ck), eval_every=2, total_steps=4,
                    warmup_steps=1, lr=1e-3)
        ts = ck / "last" / "train_state.npz"
        assert ts.exists()
        with np.load(ts) as z:
            assert int(z["__step__"]) == 2
        train_synth(steps=2, batch_size=2, cfg=cfg, window_seconds=1.0,
                    ckpt_dir=str(ck), eval_every=2, total_steps=4,
                    warmup_steps=1, lr=1e-3,
                    resume_from=str(ck / "last"))
        with np.load(ts) as z:
            assert int(z["__step__"]) == 4
