"""Native C++ omniaudio decoder tests (WAV parser + libav codecs)."""

from pathlib import Path

import numpy as np
import pytest

from omnilingual_asr_tpu.audio.decode import decode_wav_bytes
from omnilingual_asr_tpu.audio.native_lib import (
    native_available,
    native_decode,
    native_duration,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native omniaudio unavailable")


class TestNativeWav:
    def test_matches_python_parser(self, gettysburg_wav):
        nx, nsr = native_decode(gettysburg_wav)
        px, psr = decode_wav_bytes(gettysburg_wav.read_bytes())
        assert nsr == psr == 22050
        assert len(nx) == len(px)
        np.testing.assert_allclose(nx, px, atol=1e-6)

    def test_duration_probe(self, gettysburg_wav):
        d = native_duration(gettysburg_wav)
        assert abs(d - 387574 / 22050) < 0.01

    def test_stereo_mixdown(self, tmp_path, rng):
        import wave

        sr = 8000
        left = (rng.standard_normal(sr) * 1000).astype("<i2")
        right = (rng.standard_normal(sr) * 1000).astype("<i2")
        inter = np.empty(2 * sr, "<i2")
        inter[0::2], inter[1::2] = left, right
        p = tmp_path / "st.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(inter.tobytes())
        x, got_sr = native_decode(p)
        assert got_sr == sr
        want = (left.astype(np.float32) + right) / 2 / 32768.0
        np.testing.assert_allclose(x, want, atol=1e-4)


class TestNativeMp3:
    def test_lisu_mp3(self, lisu_mp3):
        out = native_decode(lisu_mp3)
        assert out is not None
        x, sr = out
        assert sr == 44100
        assert 190 < len(x) / sr < 193
        assert 0.5 < np.abs(x).max() <= 1.5

    def test_decode_with_resample(self, lisu_mp3):
        out = native_decode(lisu_mp3, target_sr=16000)
        assert out is not None
        x, sr = out
        assert sr == 16000
        assert 190 < len(x) / 16000 < 193

    def test_duration_probe_mp3(self, lisu_mp3):
        d = native_duration(lisu_mp3)
        assert 190 < d < 193

    def test_engine_accepts_mp3(self, lisu_mp3):
        """Bundled low-resource-language config end-to-end (BASELINE.json
        configs row 2)."""
        from omnilingual_asr_tpu.config import tiny_config
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        eng = TranscriptionEngine(config=tiny_config(),
                                  batch_windows_per_device=2,
                                  window_seconds=10.0)
        samples = eng._load_audio(lisu_mp3)
        assert abs(len(samples) / 16000 - 191.7) < 1.0


class TestFailure:
    def test_missing_file(self, tmp_path):
        assert native_decode(tmp_path / "nope.mp3") is None

    def test_garbage_file(self, tmp_path):
        p = tmp_path / "junk.mp3"
        p.write_bytes(b"not audio at all" * 100)
        assert native_decode(p) is None
