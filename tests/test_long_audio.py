"""Long-audio path: >6 min files dispatch through the chunked path with
globally consistent speakers and monotonic timestamps (the reference's
known cross-chunk defects, SURVEY §5 long-context row)."""

import wave

import numpy as np
import pytest

from omnilingual_asr_tpu.audio.decode import get_audio_duration
from omnilingual_asr_tpu.config import tiny_config


@pytest.fixture(scope="module")
def long_wav(tmp_path_factory):
    """6.5 minutes of synthetic speech-ish audio (> 360 s threshold)."""
    sr = 16000
    seconds = 390
    rng = np.random.default_rng(0)
    t = np.arange(seconds * sr) / sr
    x = 0.3 * np.sin(2 * np.pi * (140 + 40 * np.sin(2 * np.pi * 0.3 * t)) * t)
    x += 0.03 * rng.standard_normal(len(t))
    gate = (np.sin(2 * np.pi * 0.15 * t) > -0.6).astype(np.float32)
    data = (x * gate * 18000).astype("<i2")
    p = tmp_path_factory.mktemp("long") / "long.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())
    return p


class TestLongAudio:
    def test_duration_probe(self, long_wav):
        assert abs(get_audio_duration(long_wav) - 390) < 0.5

    def test_retry_uses_chunked_dispatch(self, long_wav, monkeypatch):
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        eng = TranscriptionEngine(config=tiny_config(),
                                  batch_windows_per_device=1,
                                  window_seconds=30.0)
        called = {}
        orig = eng.transcribe_chunked

        def spy(*a, **k):
            called["chunked"] = True
            return orig(*a, **k)

        monkeypatch.setattr(eng, "transcribe_chunked", spy)
        result = eng.transcribe_with_retry(long_wav)
        assert called.get("chunked"), "files > 6 min must dispatch chunked"

        # timestamps monotonic and spanning the file
        starts = [s.start for s in result.segments]
        assert starts == sorted(starts)
        if result.segments:
            assert result.segments[-1].end <= 391.0
            assert result.segments[-1].start > 300.0  # late windows reached

        # speaker labels globally consistent: the label set is compact
        # (Speaker 1..K with no gaps), never restarting per chunk
        speakers = {s.speaker for s in result.segments}
        nums = sorted(int(sp.split()[-1]) for sp in speakers)
        assert nums == list(range(1, len(nums) + 1))

    def test_split_audio_into_chunks_compat(self, long_wav):
        from omnilingual_asr.models.inference.gemini_pipeline import (
            CHUNK_DURATION_SECONDS,
            split_audio_into_chunks,
        )

        chunks = split_audio_into_chunks(long_wav)
        # 390 s / 300 s -> 2 chunks at offsets 0 and 300
        assert len(chunks) == 2
        assert chunks[0][1] == 0.0
        assert chunks[1][1] == CHUNK_DURATION_SECONDS


class TestNineAndAHalfHourPlan:
    """Scheduler math for the BASELINE 9.5 h configuration — no audio is
    processed; verifies the window/batch plan that the 8-chip run uses."""

    def test_window_and_batch_plan(self):
        from omnilingual_asr_tpu.config import MeshConfig, tiny_config
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        cfg = tiny_config().replace(mesh=MeshConfig(data=8, model=1))
        eng = TranscriptionEngine(config=cfg, batch_windows_per_device=4)
        assert eng.batch_size == 32  # 4 windows x 8 chips per dispatch

        seconds = 9.5 * 3600
        sr = cfg.frontend.sample_rate
        n_samples = int(seconds * sr)
        n_windows = -(-n_samples // eng.window_samples)
        assert n_windows == 1140  # 9.5 h / 30 s
        n_batches = -(-n_windows // eng.batch_size)
        assert n_batches == 36
        # At the measured ~0.11 s per 8-window batch on one v5e chip, 36
        # batches of 32 windows over 8 chips is well under the 2-minute
        # target; the plan is transfer-bound, not compute-bound.


class TestStreamedWindows:
    """Round-4 pipelined decode (VERDICT r3 #4): PCM windows streamed off
    the container must match the in-memory window cut exactly."""

    def test_stream_matches_full_decode(self, long_wav):
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        eng = TranscriptionEngine(config=tiny_config(),
                                  batch_windows_per_device=1,
                                  window_seconds=30.0)
        s = eng._stream_windows_wav(long_wav)
        assert s is not None
        win_iter, n_win, n_last, duration_s = s
        assert abs(duration_s - 390) < 0.01
        samples = eng._load_audio(long_wav)
        ref = eng._windows(samples)
        assert n_win == len(ref)
        assert n_last == len(samples) - (n_win - 1) * eng.window_samples
        for (o1, w1), (o2, w2) in zip(win_iter, ref):
            assert o1 == o2
            # streamed windows stay int16 (wire-ready, no f32 round trip);
            # normalize for comparison with the full-decode f32 windows
            assert w1.dtype == np.int16
            np.testing.assert_allclose(
                w1.astype(np.float32) * (1.0 / 32768.0), w2, atol=1e-6)

    def test_non_wav_falls_back(self, tmp_path):
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        eng = TranscriptionEngine(config=tiny_config(),
                                  batch_windows_per_device=1,
                                  window_seconds=30.0)
        p = tmp_path / "not_audio.wav"
        p.write_bytes(b"RIFFgarbage")
        assert eng._stream_windows_wav(p) is None

    @pytest.mark.slow
    def test_streamed_transcribe_matches_buffered(self, long_wav):
        """End-to-end: the streaming long-file path produces the same
        segments as the buffered path."""
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        # crop re-embedding needs the full sample buffer, so auto(->crop)
        # engines keep the buffered path; pin inline to exercise streaming
        eng = TranscriptionEngine(config=tiny_config(),
                                  batch_windows_per_device=2,
                                  window_seconds=30.0,
                                  speaker_mode="inline")
        r_stream = eng.transcribe(long_wav)
        assert "decode" not in eng.last_trace.stages   # streamed
        assert "extract" in eng.last_trace.stages
        # buffered reference: force full decode by dropping the threshold
        import omnilingual_asr_tpu.engine as E

        orig = eng._stream_windows_wav
        eng._stream_windows_wav = lambda p: None
        r_buf = eng.transcribe(long_wav)
        eng._stream_windows_wav = orig
        assert "decode" in eng.last_trace.stages
        assert len(r_stream.segments) == len(r_buf.segments)
        for a, b in zip(r_stream.segments, r_buf.segments):
            assert a.start == b.start and a.end == b.end
            assert a.text == b.text
