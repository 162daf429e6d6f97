"""Summarizer tests: template contract + neural decoder architecture."""

import numpy as np

from omnilingual_asr_tpu.config import tiny_config
from omnilingual_asr_tpu.models.summarizer import (
    SummaryDecoder,
    template_summary,
)


class TestTemplate:
    def test_mentions_required_facts(self):
        s = template_summary(duration_s=62.0, n_speakers=2, n_segments=14,
                             language_names=["English", "Lisu"],
                             top_emotion="happy")
        assert "2 speakers" in s
        assert "happy" in s
        assert "English" in s and "Lisu" in s

    def test_singular_speaker(self):
        s = template_summary(duration_s=5.0, n_speakers=1, n_segments=2,
                             language_names=[], top_emotion="neutral")
        assert "1 speaker " in s
        assert "speakers" not in s


class TestNeuralSummarizer:
    def test_pooling_shapes(self, rng):
        cfg = tiny_config()
        dec = SummaryDecoder(cfg, n_layers=1, pool_windows=8)
        D = cfg.encoder.d_model
        windows = [rng.standard_normal((50, D)).astype(np.float32)
                   for _ in range(3)]
        pooled = dec.pool_states(windows)
        assert pooled.shape == (8, D)
        assert np.abs(pooled[:3]).sum() > 0
        np.testing.assert_array_equal(pooled[3:], 0)

    def test_pooling_compresses_many_windows(self, rng):
        cfg = tiny_config()
        dec = SummaryDecoder(cfg, n_layers=1, pool_windows=4)
        D = cfg.encoder.d_model
        windows = [rng.standard_normal((10, D)).astype(np.float32)
                   for _ in range(20)]  # 20 windows -> 4 slots
        pooled = dec.pool_states(windows)
        assert pooled.shape == (4, D)
        assert np.abs(pooled).sum() > 0

    def test_summarize_runs(self, rng):
        cfg = tiny_config()
        dec = SummaryDecoder(cfg, n_layers=1, pool_windows=4)
        D = cfg.encoder.d_model
        windows = [rng.standard_normal((20, D)).astype(np.float32)]
        out = dec.summarize(windows, max_len=16)
        assert out is None or isinstance(out, str)


class TestHonestGating:
    """Neural summaries ship only when sane AND consistent with the
    engine's own metadata (round-3 session-4: real audio produced
    '2 speakers talk in 222 2 2222...' which replaced the template)."""

    def test_degenerate_digit_soup_rejected(self):
        from omnilingual_asr_tpu.models.summarizer import _degenerate

        assert _degenerate("2 speakers talk in 222 2 and 22 2 2222 2 2")
        assert _degenerate("the the the the the the")
        assert not _degenerate(
            "A conversation between 2 speakers in Greek. "
            "Overall tone: happy.")

    def test_consistent_accepts_matching_facts(self):
        from omnilingual_asr_tpu.models.summarizer import summary_consistent

        s = "A conversation between 2 speakers in Greek. Overall tone: sad."
        assert summary_consistent(s, n_speakers=2, tone="sad")

    def test_wrong_speaker_count_rejected(self):
        from omnilingual_asr_tpu.models.summarizer import summary_consistent

        s = "A conversation between 3 speakers in Greek. Overall tone: sad."
        assert not summary_consistent(s, n_speakers=2, tone="sad")

    def test_wrong_or_missing_tone_rejected(self):
        from omnilingual_asr_tpu.models.summarizer import summary_consistent

        s = "A conversation between 2 speakers in Greek. Overall tone: sad."
        assert not summary_consistent(s, n_speakers=2, tone="happy")
        assert not summary_consistent(
            "A conversation between 2 speakers in Greek.",
            n_speakers=2, tone="sad")

    def test_single_speaker_phrasing_accepted(self):
        from omnilingual_asr_tpu.models.summarizer import summary_consistent

        s = "A single speaker talks in Thai. Overall tone: neutral."
        assert summary_consistent(s, n_speakers=1, tone="neutral")

    def test_stray_digit_claim_rejected(self):
        from omnilingual_asr_tpu.models.summarizer import summary_consistent

        s = "2 speakers talk in Greek and 7 others; the overall tone is sad."
        assert not summary_consistent(s, n_speakers=2, tone="sad")


class TestEngineSummarizerWiring:
    def _wav(self, tmp_path):
        import wave

        p = tmp_path / "s.wav"
        x = (np.sin(np.arange(16000) * 0.08) * 15000).astype("<i2")
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(x.tobytes())
        return p

    def test_default_engine_uses_template(self, tmp_path):
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        eng = TranscriptionEngine(config=tiny_config(),
                                  batch_windows_per_device=1,
                                  window_seconds=5.0)
        assert eng._summarizer is None
        res = eng.transcribe(self._wav(tmp_path))
        if res.segments:  # random-init model may emit no segments
            assert "speaker" in (res.summary or "")

    def test_summarizer_params_enable_neural_path(self, tmp_path):
        """Explicit summarizer weights activate SummaryDecoder; the engine
        ships encoder states and never crashes; template remains the
        fallback when the decode is empty."""
        import jax

        from omnilingual_asr_tpu.engine import TranscriptionEngine
        from omnilingual_asr_tpu.models.translation import translator_init

        cfg = tiny_config()
        sp = translator_init(jax.random.PRNGKey(3), cfg, n_layers=2)
        eng = TranscriptionEngine(config=cfg, summarizer_params=sp,
                                  batch_windows_per_device=1,
                                  window_seconds=5.0)
        assert eng._summarizer is not None
        res = eng.transcribe(self._wav(tmp_path))
        assert res is not None
        assert res.summary is None or isinstance(res.summary, str)


class TestFactConditioning:
    """Fact-prefix conditioning (round 3): the engine's own metadata is
    force-decoded as a prefix so the continuation reads the facts instead
    of estimating them from mean-pooled states."""

    def _facts(self):
        return {"n_speakers": 2, "tone": "happy",
                "language_names": ["Swahili", "Greek"]}

    def test_fact_prefix_roundtrip(self):
        from omnilingual_asr_tpu.models.summarizer import (fact_prefix,
                                                           fact_prefix_ids)

        cfg = tiny_config()
        s = fact_prefix(**self._facts())
        ids = fact_prefix_ids(cfg.vocab, **self._facts())
        assert bytes(cfg.vocab.id_to_byte(i) for i in ids).decode() == s
        assert all(i > 0 for i in ids)  # no EOS inside the forced prefix

    def test_forced_prefix_decoded_verbatim(self, rng):
        import jax
        import jax.numpy as jnp

        from omnilingual_asr_tpu.models.translation import (greedy_translate,
                                                            translator_init)

        cfg = tiny_config()
        params = translator_init(jax.random.PRNGKey(0), cfg, n_layers=1)
        D = cfg.encoder.d_model
        enc = jnp.asarray(rng.standard_normal((1, 4, D)), jnp.float32)
        mask = jnp.ones((1, 4), bool)
        forced = np.full((1, 12), -1, np.int32)
        forced[0, :5] = [10, 20, 30, 40, 50]
        toks = np.asarray(greedy_translate(
            params, enc, mask, cfg, max_len=12, n_heads=2,
            forced=jnp.asarray(forced)))
        np.testing.assert_array_equal(toks[0, :5], [10, 20, 30, 40, 50])

    def test_forced_none_matches_default(self, rng):
        import jax
        import jax.numpy as jnp

        from omnilingual_asr_tpu.models.translation import (greedy_translate,
                                                            translator_init)

        cfg = tiny_config()
        params = translator_init(jax.random.PRNGKey(0), cfg, n_layers=1)
        D = cfg.encoder.d_model
        enc = jnp.asarray(rng.standard_normal((1, 4, D)), jnp.float32)
        mask = jnp.ones((1, 4), bool)
        t1 = np.asarray(greedy_translate(params, enc, mask, cfg, max_len=8,
                                         n_heads=2))
        t2 = np.asarray(greedy_translate(
            params, enc, mask, cfg, max_len=8, n_heads=2,
            forced=jnp.full((1, 8), -1, jnp.int32)))
        np.testing.assert_array_equal(t1, t2)

    def test_fact_conditioned_detection_and_prefix_strip(self, rng):
        import jax

        from omnilingual_asr_tpu.models.translation import translator_init

        cfg = tiny_config()
        params = dict(translator_init(jax.random.PRNGKey(0), cfg, 1))
        dec = SummaryDecoder(cfg, params, pool_windows=4)
        assert not dec.fact_conditioned
        params["fact_cond"] = np.ones((), np.float32)
        dec = SummaryDecoder(cfg, params, pool_windows=4)
        assert dec.fact_conditioned
        D = cfg.encoder.d_model
        windows = [rng.standard_normal((20, D)).astype(np.float32)]
        out = dec.summarize(windows, max_len=64, facts=self._facts())
        # Continuation only — the serialized prefix must not leak out.
        assert out is None or not out.startswith("[2 |")

    def test_unconditioned_checkpoint_ignores_facts(self, rng):
        import jax

        from omnilingual_asr_tpu.models.translation import translator_init

        cfg = tiny_config()
        dec = SummaryDecoder(
            cfg, translator_init(jax.random.PRNGKey(0), cfg, 1),
            pool_windows=4)
        D = cfg.encoder.d_model
        windows = [rng.standard_normal((20, D)).astype(np.float32)]
        a = dec.summarize(windows, max_len=16)
        b = dec.summarize(windows, max_len=16, facts=self._facts())
        assert a == b  # facts are a no-op without the marker

    def test_fact_cond_marker_survives_npz_roundtrip(self, tmp_path):
        import jax

        from omnilingual_asr_tpu.models.translation import (load_translator,
                                                            translator_init)
        from omnilingual_asr_tpu.models.zoo import save_release

        cfg = tiny_config()
        params = dict(translator_init(jax.random.PRNGKey(0), cfg, 2))
        params["fact_cond"] = np.ones((), np.float32)
        save_release(tmp_path / "summarizer.npz", jax.device_get(params))
        back = load_translator(tmp_path / "summarizer.npz", cfg, n_layers=2)
        assert "fact_cond" in back

    def test_fact_cond_marker_survives_orbax_roundtrip(self, tmp_path):
        import jax

        from omnilingual_asr_tpu.models.translation import (load_translator,
                                                            save_translator,
                                                            translator_init)

        cfg = tiny_config()
        params = dict(translator_init(jax.random.PRNGKey(0), cfg, 2))
        params["fact_cond"] = np.ones((), np.float32)
        save_translator(tmp_path / "s", jax.device_get(params))
        back = load_translator(tmp_path / "s", cfg, n_layers=2)
        assert "fact_cond" in back

    def test_encode_summary_prefix_masked_from_loss(self):
        from omnilingual_asr_tpu.train.summary_train import encode_summary

        cfg = tiny_config()
        inp, tgt, msk = encode_summary("[pfx] body", cfg.vocab, n_prefix=6)
        assert not msk[:6].any()        # prefix positions carry no loss
        assert msk[6:11].all()          # continuation + EOS do
        # teacher forcing still sees the prefix tokens as input
        assert tgt[0] == cfg.vocab.byte_to_id(ord("["))
