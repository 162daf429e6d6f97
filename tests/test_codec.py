"""μ-law ingress codec (audio/codec.py) and the engine's wire-format knob."""

import numpy as np

from omnilingual_asr_tpu.audio.codec import (
    mulaw_decode,
    mulaw_decode_np,
    mulaw_encode,
)


def test_roundtrip_snr():
    rng = np.random.default_rng(0)
    # speech-like: mostly small amplitudes (the regime μ-law favors)
    x = np.tanh(rng.standard_normal(48000) * 0.2).astype(np.float32)
    u = mulaw_encode(x)
    assert u.dtype == np.uint8
    y = mulaw_decode_np(u)
    err = x - y
    snr_db = 10 * np.log10(np.mean(x ** 2) / np.mean(err ** 2))
    assert snr_db > 30.0, snr_db


def test_device_decode_matches_host():
    rng = np.random.default_rng(1)
    x = np.clip(rng.standard_normal(1000) * 0.3, -1, 1).astype(np.float32)
    u = mulaw_encode(x)
    np.testing.assert_allclose(np.asarray(mulaw_decode(u)),
                               mulaw_decode_np(u), rtol=1e-5, atol=1e-6)


def test_extremes_and_zero():
    x = np.array([-1.0, -0.5, 0.0, 0.5, 1.0], np.float32)
    y = mulaw_decode_np(mulaw_encode(x))
    np.testing.assert_allclose(y, x, atol=5e-3)


def test_mel_features_survive_mulaw():
    """log-mel of μ-law-companded speech stays within a fraction of a dB of
    the i16 path over speech frames — the feature-level claim behind
    'ingress=mulaw leaves WER unchanged' (text-level equality is only
    meaningful for a trained model; eval_synth --ingress measures that)."""
    import jax.numpy as jnp

    from omnilingual_asr_tpu.config import FrontendConfig
    from omnilingual_asr_tpu.ops.mel_pallas import (
        MelFrontend,
        log_mel_frames_pallas,
    )

    fe_cfg = FrontendConfig()
    fe = MelFrontend(fe_cfg)
    rng = np.random.default_rng(2)
    sr = fe_cfg.sample_rate
    t = np.arange(4 * sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 160 * t)
         * (1 + 0.5 * np.sin(2 * np.pi * 2.0 * t))
         + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
    x_i16 = (np.clip(x * 32768, -32768, 32767).astype(np.int16)
             .astype(np.float32) / 32768.0)
    x_mu = mulaw_decode_np(mulaw_encode(x))

    def mel_of(sig):
        frames, _ = fe.frames_from_signal(jnp.asarray(sig))
        m = log_mel_frames_pallas(frames, fe.cw, fe.sw, fe.fb, fe_cfg,
                                  interpret=fe.interpret)
        return np.asarray(m)

    a, b = mel_of(x_i16), mel_of(x_mu)
    # compare over energetic bins only (log floor dominates silence)
    speech = a > np.percentile(a, 20)
    diff_db = np.abs(a - b)[speech] * 10.0 / np.log(10.0)
    assert np.median(diff_db) < 0.5, float(np.median(diff_db))


def test_engine_mulaw_ingress_runs(tmp_path):
    """ingress='mulaw' produces a schema-valid result end-to-end and ships
    uint8 on the wire."""
    import wave

    import jax

    from omnilingual_asr_tpu.config import tiny_config
    from omnilingual_asr_tpu.engine import TranscriptionEngine
    from omnilingual_asr_tpu.models.conformer import asr_init

    cfg = tiny_config()
    params = asr_init(jax.random.PRNGKey(0), cfg)
    sr = cfg.frontend.sample_rate
    rng = np.random.default_rng(2)
    t = np.arange(6 * sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 160 * t)
         + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
    p = tmp_path / "a.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 20000).astype("<i2").tobytes())

    eng = TranscriptionEngine(config=cfg, params=params,
                              window_seconds=8.0,
                              batch_windows_per_device=1,
                              ingress="mulaw")
    res = eng.transcribe(str(p))
    assert res.segments
    for s in res.segments:
        assert s.end > s.start and s.speaker.startswith("Speaker ")
