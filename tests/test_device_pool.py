"""Device-resident example pool (train/device_pool.py): bake-mode collate,
pool build/refresh, on-device augmentation, and equivalence of the pool
train step with the host-batch train step on identical inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnilingual_asr_tpu.config import MeshConfig, tiny_config
from omnilingual_asr_tpu.parallel.mesh import build_mesh
from omnilingual_asr_tpu.train.device_pool import (build_pool, encode_wire,
                                                   make_pool_train_step)
from omnilingual_asr_tpu.train.step import make_optimizer, make_train_step
from omnilingual_asr_tpu.train.synth import SynthBatcher


@pytest.fixture(scope="module")
def cfg():
    return tiny_config().replace(mesh=MeshConfig(data=1, model=1))


@pytest.fixture(scope="module")
def bake_batcher(cfg):
    b = SynthBatcher(cfg, batch_size=4, window_seconds=2.0, seed=3,
                     n_threads=1, real_fraction=0.0,
                     codeswitch_fraction=0.0, bake_mode=True)
    yield b
    b.close()


class TestBakeMode:
    def test_bake_batch_has_n_samples_and_clean_padding(self, bake_batcher):
        batch = next(iter(bake_batcher))
        assert "n_samples" in batch
        n = batch["n_samples"]
        assert n.dtype == np.int32 and (n > 0).all()
        # bake mode: no additive noise, so the padding region is exact zero
        for b in range(len(n)):
            assert np.all(batch["samples"][b, n[b]:] == 0.0)

    def test_normal_mode_has_no_n_samples(self, cfg):
        b = SynthBatcher(cfg, batch_size=2, window_seconds=2.0, seed=0,
                         n_threads=1, real_fraction=0.0,
                         codeswitch_fraction=0.0)
        batch = next(iter(b))
        b.close()
        assert "n_samples" not in batch
        # noise augmentation reaches the padding edge only through clipping;
        # the signal region must be non-silent
        assert float(np.abs(batch["samples"]).max()) > 0


class TestDevicePool:
    def test_build_pool_shapes_and_wire(self, bake_batcher):
        pool = build_pool(iter(bake_batcher), 8, wire="i16")
        assert pool["samples"].dtype == np.int16
        assert pool["samples"].shape[0] == 8
        assert pool["n_samples"].shape == (8,)
        assert pool["labels"].shape[0] == 8

    def test_pool_step_runs_and_loss_decreases(self, cfg, bake_batcher):
        mesh = build_mesh(cfg.mesh)
        init_state, pool_step, refresh_pool = make_pool_train_step(
            cfg, mesh, tx=make_optimizer(lr=3e-3, warmup_steps=1),
            with_translator=True, snr_range=(15.0, 40.0))
        pool_np = build_pool(iter(bake_batcher), 8, wire="i16")
        pool = {k: jnp.asarray(v) for k, v in pool_np.items()}
        state = init_state(seed=0)
        params, opt_state, step = state.params, state.opt_state, state.step
        scalars = {k: jnp.float32(1.0)
                   for k in ("w_spk", "w_trans", "w_aug", "w_fce", "w_ctc")}
        losses = []
        rng = np.random.default_rng(0)
        for _ in range(6):
            idx = jnp.asarray(rng.integers(0, 8, 4), jnp.int32)
            params, opt_state, step, metrics = pool_step(
                params, opt_state, pool, idx, step, scalars)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_refresh_pool_overwrites_slice(self, cfg, bake_batcher):
        mesh = build_mesh(cfg.mesh)
        _, _, refresh_pool = make_pool_train_step(
            cfg, mesh, with_translator=True)
        pool_np = build_pool(iter(bake_batcher), 8, wire="i16")
        pool = {k: jnp.asarray(v) for k, v in pool_np.items()}
        nb = next(iter(bake_batcher))
        new = {k: jnp.asarray(encode_wire(v, "i16")
                              if k == "samples" else v)
               for k, v in nb.items()}
        before = np.asarray(pool["samples"][:4]).copy()
        pool2 = refresh_pool(pool, jnp.int32(4), new)
        # rows [0:4) unchanged, rows [4:8) replaced with the fresh batch
        np.testing.assert_array_equal(np.asarray(pool2["samples"][:4]),
                                      before)
        np.testing.assert_array_equal(np.asarray(pool2["samples"][4:]),
                                      np.asarray(new["samples"]))
        np.testing.assert_array_equal(np.asarray(pool2["n_samples"][4:]),
                                      nb["n_samples"])

    def test_pool_step_matches_host_batch_step(self, cfg, bake_batcher):
        """With on-device augmentation OFF, one pool step must produce the
        same parameter update as the host-batch train step fed the exact
        gathered rows (same i16 wire, same SpecAugment key via step)."""
        mesh = build_mesh(cfg.mesh)
        tx = make_optimizer(lr=1e-3, warmup_steps=1)
        init_state, pool_step, _ = make_pool_train_step(
            cfg, mesh, tx=tx, with_translator=True, snr_range=None)
        pool_np = build_pool(iter(bake_batcher), 8, wire="i16")
        pool = {k: jnp.asarray(v) for k, v in pool_np.items()}
        state = init_state(seed=1)
        scalars = {k: jnp.float32(1.0)
                   for k in ("w_spk", "w_trans", "w_aug", "w_fce", "w_ctc")}
        idx = np.asarray([1, 3, 0, 6])
        p1, _, _, m1 = pool_step(
            jax.tree.map(jnp.copy, state.params),
            jax.tree.map(jnp.copy, state.opt_state),
            pool, jnp.asarray(idx, jnp.int32), state.step, scalars)

        host_batch = {k: v[idx] for k, v in pool_np.items()
                      if k != "n_samples"}
        _, train_step = make_train_step(
            cfg, mesh, tx=tx, from_samples=True,
            batch_keys=tuple(host_batch.keys()) + tuple(scalars.keys()),
            with_translator=True)
        dev_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
        dev_batch.update(scalars)
        p2, _, _, m2 = train_step(
            jax.tree.map(jnp.copy, state.params),
            jax.tree.map(jnp.copy, state.opt_state),
            dev_batch, state.step)

        assert np.isclose(float(m1["loss"]), float(m2["loss"]),
                          rtol=1e-5, atol=1e-6)
        flat1 = jax.tree.leaves(p1)
        flat2 = jax.tree.leaves(p2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=2e-4, atol=2e-5)

    def test_on_device_noise_is_fresh_per_step_and_masked(self, cfg,
                                                          bake_batcher):
        """Two pool steps at different step counters on the same rows see
        different noise; the padding region past n_samples stays silent."""
        mesh = build_mesh(cfg.mesh)
        init_state, pool_step, _ = make_pool_train_step(
            cfg, mesh, tx=make_optimizer(lr=0.0, warmup_steps=1),
            with_translator=True, snr_range=(5.0, 5.0))
        pool_np = build_pool(iter(bake_batcher), 4, wire="i16")
        pool = {k: jnp.asarray(v) for k, v in pool_np.items()}
        state = init_state(seed=0)
        scalars = {k: jnp.float32(0.0)
                   for k in ("w_spk", "w_trans", "w_aug", "w_fce", "w_ctc")}
        scalars["w_ctc"] = jnp.float32(1.0)
        idx = jnp.asarray([0, 1, 2, 3], jnp.int32)
        _, _, _, m1 = pool_step(
            jax.tree.map(jnp.copy, state.params),
            jax.tree.map(jnp.copy, state.opt_state),
            pool, idx, jnp.int32(0), scalars)
        _, _, _, m2 = pool_step(
            jax.tree.map(jnp.copy, state.params),
            jax.tree.map(jnp.copy, state.opt_state),
            pool, idx, jnp.int32(1), scalars)
        # at 5 dB SNR the noise dominates the mel features: identical rows
        # through different step keys must not produce identical losses
        assert float(m1["loss"]) != float(m2["loss"])
