"""Release-checkpoint format (float16 .npz) and shipped-model discovery.

The training format is Orbax (models/zoo.py save_checkpoint); the shipping
format is one float16 .npz per model so a trained checkpoint can live in the
repo at half the fp32 size and load with numpy alone. Engines and
PipelineConfig.from_env discover `checkpoints/release/` automatically
(overridable via OMNIASR_RELEASE_DIR; "" opts out — tests/conftest.py).
"""

import jax
import numpy as np
import pytest

from omnilingual_asr_tpu.config import PipelineConfig, tiny_config
from omnilingual_asr_tpu.models.conformer import asr_init
from omnilingual_asr_tpu.models.translation import translator_init
from omnilingual_asr_tpu.models.zoo import (
    load_checkpoint,
    load_release,
    save_release,
)


def test_release_roundtrip_tiny(tmp_path):
    cfg = tiny_config()
    params = asr_init(jax.random.PRNGKey(0), cfg)
    path = tmp_path / "asr.npz"
    save_release(path, params)

    restored = load_checkpoint(path, cfg)  # .npz dispatch
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(restored)}
    assert len(flat_a) == len(flat_b)
    for k, a in flat_a:
        b = flat_b[jax.tree_util.keystr(k)]
        assert b.dtype == np.asarray(a).dtype  # upcast back to template dtype
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_release_shape_mismatch_raises(tmp_path):
    cfg = tiny_config()
    params = translator_init(jax.random.PRNGKey(0), cfg, n_layers=2)
    path = tmp_path / "translator.npz"
    save_release(path, params)
    template = jax.eval_shape(
        lambda: translator_init(jax.random.PRNGKey(0), cfg, n_layers=4))
    with pytest.raises((KeyError, ValueError)):
        load_release(path, template)


def test_from_env_discovers_release(tmp_path, monkeypatch):
    rel = tmp_path / "release"
    rel.mkdir()
    cfg = tiny_config()
    save_release(rel / "asr.npz", asr_init(jax.random.PRNGKey(0), cfg))
    monkeypatch.delenv("OMNIASR_CHECKPOINT", raising=False)
    monkeypatch.setenv("OMNIASR_RELEASE_DIR", str(rel))
    assert PipelineConfig.from_env().checkpoint_path == str(rel / "asr.npz")

    # "" opts out (the conftest default for hermetic tests).
    monkeypatch.setenv("OMNIASR_RELEASE_DIR", "")
    assert PipelineConfig.from_env().checkpoint_path is None

    # Explicit OMNIASR_CHECKPOINT wins over discovery.
    monkeypatch.setenv("OMNIASR_RELEASE_DIR", str(rel))
    monkeypatch.setenv("OMNIASR_CHECKPOINT", "/elsewhere/asr")
    assert PipelineConfig.from_env().checkpoint_path == "/elsewhere/asr"


def test_release_config_decode_block():
    """A release config.json may carry tuned decode operating points (e.g.
    the AHC threshold measured for that trunk's speaker embeddings); they
    restore through from_json, and explicit overrides still win."""
    import json

    cfg = tiny_config()
    d = json.loads(cfg.to_json())
    d["decode"] = {"ahc_threshold": 0.18}
    back = PipelineConfig.from_json(json.dumps(d))
    assert back.decode.ahc_threshold == 0.18
    assert back.encoder == cfg.encoder
    over = PipelineConfig.from_json(json.dumps(d), decode=cfg.decode)
    assert over.decode.ahc_threshold is None


def test_release_config_json_roundtrip(tmp_path, monkeypatch):
    """A release dir with config.json rebuilds the released model's exact
    dims through from_env, even when they differ from the code default."""
    cfg = tiny_config()
    assert PipelineConfig.from_json(cfg.to_json()).encoder == cfg.encoder
    assert PipelineConfig.from_json(cfg.to_json()).frontend == cfg.frontend

    rel = tmp_path / "release"
    rel.mkdir()
    save_release(rel / "asr.npz", asr_init(jax.random.PRNGKey(0), cfg))
    (rel / "config.json").write_text(cfg.to_json())
    monkeypatch.delenv("OMNIASR_CHECKPOINT", raising=False)
    monkeypatch.setenv("OMNIASR_RELEASE_DIR", str(rel))
    got = PipelineConfig.from_env()
    assert got.encoder == cfg.encoder
    assert got.checkpoint_path == str(rel / "asr.npz")


def test_engine_discovers_release_decoders(tmp_path, monkeypatch):
    from omnilingual_asr_tpu.engine import TranscriptionEngine

    rel = tmp_path / "release"
    rel.mkdir()
    cfg = tiny_config()
    save_release(rel / "translator.npz",
                 translator_init(jax.random.PRNGKey(1), cfg, n_layers=4))
    save_release(rel / "summarizer.npz",
                 translator_init(jax.random.PRNGKey(2), cfg, n_layers=2))
    monkeypatch.setenv("OMNIASR_RELEASE_DIR", str(rel))
    eng = TranscriptionEngine(config=cfg)
    assert eng._translator is not None
    assert eng._summarizer is not None

    # A release dir whose decoder shapes don't match the engine config is
    # skipped, not fatal (discovered loads are best-effort).
    big = tmp_path / "release_big"
    big.mkdir()
    wrong = tiny_config().replace(
        encoder=tiny_config().encoder.__class__(d_model=64, n_layers=1,
                                                n_heads=2, conv_kernel=8))
    save_release(big / "translator.npz",
                 translator_init(jax.random.PRNGKey(3), wrong, n_layers=4))
    monkeypatch.setenv("OMNIASR_RELEASE_DIR", str(big))
    eng2 = TranscriptionEngine(config=cfg)
    assert eng2._translator is None


def test_config_for_checkpoint_bypasses_release(tmp_path, monkeypatch):
    """--ckpt eval flows must adopt the checkpoint's own config.json dims,
    never the installed release's (ADVICE r2 medium: run_evals.sh against a
    non-release-dims checkpoint failed with a template shape mismatch)."""
    import dataclasses as dc

    from omnilingual_asr_tpu.config import (PipelineConfig,
                                            config_for_checkpoint,
                                            tiny_config)

    # an installed release with DIFFERENT dims (d128x2 tiny)
    rel = tmp_path / "release"
    rel.mkdir()
    (rel / "asr.npz").write_bytes(b"notreallyanpz")
    (rel / "config.json").write_text(tiny_config().to_json())
    monkeypatch.setenv("OMNIASR_RELEASE_DIR", str(rel))

    # a training checkpoint with its own config.json (d256x4)
    ck = tmp_path / "run" / "best"
    (ck / "asr").mkdir(parents=True)
    rung = tiny_config().replace(encoder=dc.replace(
        tiny_config().encoder, d_model=256, n_layers=4, n_heads=4))
    (ck / "config.json").write_text(rung.to_json())

    cfg = config_for_checkpoint(str(ck / "asr"))
    assert cfg.encoder.d_model == 256 and cfg.encoder.n_layers == 4
    assert cfg.checkpoint_path == str(ck / "asr")

    # without a config.json beside it: code-default dims, release ignored
    ck2 = tmp_path / "run2" / "best"
    (ck2 / "asr").mkdir(parents=True)
    cfg2 = config_for_checkpoint(str(ck2 / "asr"))
    assert cfg2.encoder.d_model == PipelineConfig().encoder.d_model
