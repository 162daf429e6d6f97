"""Energy VAD tests."""

import numpy as np

from omnilingual_asr_tpu.audio.frontend import log_mel_jax
from omnilingual_asr_tpu.config import FrontendConfig
from omnilingual_asr_tpu.diarization.vad import speech_ratio, vad_mask


def mel_of(x):
    return np.asarray(log_mel_jax(x.astype(np.float32), FrontendConfig()))


class TestVAD:
    def test_speech_vs_silence(self, rng):
        sr = 16000
        t = np.arange(sr) / sr
        tone = 0.3 * np.sin(2 * np.pi * 300 * t)
        quiet = 0.0005 * rng.standard_normal(sr)
        x = np.concatenate([quiet, tone, quiet])
        mask = vad_mask(mel_of(x))
        T = len(mask)
        third = T // 3
        assert mask[third + 10: 2 * third - 10].mean() > 0.9  # tone = speech
        assert mask[:third - 10].mean() < 0.2                 # silence
        assert mask[2 * third + 10:].mean() < 0.2

    def test_all_silence(self, rng):
        x = 0.0001 * rng.standard_normal(16000)
        assert speech_ratio(mel_of(x)) < 0.5

    def test_gap_bridging(self, rng):
        sr = 16000
        t = np.arange(sr // 4) / sr
        tone = 0.3 * np.sin(2 * np.pi * 300 * t)
        tiny_gap = np.zeros(320)  # 2 frames
        x = np.concatenate([tone, tiny_gap, tone])
        # windowing smears the 320-sample gap over ~4-5 frames; allow it
        mask = vad_mask(mel_of(x), min_gap_frames=6)
        mid = len(mask) // 2
        assert mask[mid - 2: mid + 2].all()

    def test_empty(self):
        assert vad_mask(np.zeros((0, 128))).shape == (0,)
