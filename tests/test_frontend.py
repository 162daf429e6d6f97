"""Audio frontend tests: decode, resample, log-mel (JAX ref vs NumPy vs Pallas)."""

import numpy as np
import pytest

from omnilingual_asr_tpu.audio.decode import (
    decode_audio,
    decode_wav_bytes,
    get_audio_duration,
    get_mime_type,
)
from omnilingual_asr_tpu.audio.frontend import (
    hann_window,
    hz_to_mel,
    log_mel_jax,
    mel_filterbank,
    mel_to_hz,
)
from omnilingual_asr_tpu.audio.resample import resample
from omnilingual_asr_tpu.config import FrontendConfig


def _numpy_log_mel(x, cfg):
    """Independent NumPy ground truth."""
    y = np.concatenate([x[:1], x[1:] - cfg.preemphasis * x[:-1]]).astype(np.float64)
    n_frames = cfg.frames_for_samples(len(y))
    win = hann_window(cfg.win_length).astype(np.float64)
    frames = np.stack(
        [y[i * cfg.hop_length : i * cfg.hop_length + cfg.win_length] for i in range(n_frames)]
    )
    spec = np.fft.rfft(frames * win, n=cfg.n_fft, axis=-1)
    power = np.abs(spec) ** 2
    fb = mel_filterbank(cfg).astype(np.float64)
    return np.log(np.maximum(power @ fb, cfg.log_floor))


class TestDecode:
    def test_wav_roundtrip_pcm16(self, rng):
        sr = 16000
        x = (rng.standard_normal(sr) * 0.1).astype(np.float32)
        import io, wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((x * 32767).astype("<i2").tobytes())
        y, sr_out = decode_wav_bytes(buf.getvalue())
        assert sr_out == sr
        np.testing.assert_allclose(y, (x * 32767).astype("<i2") / 32768.0, atol=1e-6)

    def test_gettysburg_decode(self, gettysburg_wav):
        x, sr = decode_audio(gettysburg_wav)
        assert sr == 22050
        assert 17.0 < len(x) / sr < 18.0  # 387574 samples @ 22050
        assert np.abs(x).max() <= 1.0

    def test_gettysburg_duration(self, gettysburg_wav):
        d = get_audio_duration(gettysburg_wav)
        assert abs(d - 387574 / 22050) < 0.01

    def test_duration_missing_file_returns_zero(self, tmp_path):
        # Reference semantics: failures -> 0.0 (gemini_pipeline.py:238-240)
        assert get_audio_duration(tmp_path / "nope.wav") == 0.0

    def test_mime_types(self):
        assert get_mime_type("a.wav") == "audio/wav"
        assert get_mime_type("a.MP3") == "audio/mp3"
        assert get_mime_type("a.m4a") == "audio/mp4"
        assert get_mime_type("a.xyz") == "audio/wav"


class TestResample:
    def test_sine_preserved(self):
        sr_in, sr_out, f0 = 22050, 16000, 440.0
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        y = resample(x, sr_in, sr_out)
        assert abs(len(y) - sr_out) <= 2
        t2 = np.arange(len(y)) / sr_out
        expect = np.sin(2 * np.pi * f0 * t2)
        # Ignore filter edges.
        sl = slice(500, len(y) - 500)
        err = np.abs(y[sl] - expect[sl]).max()
        assert err < 5e-3, err

    def test_identity(self, rng):
        x = rng.standard_normal(1000).astype(np.float32)
        np.testing.assert_array_equal(resample(x, 16000, 16000), x)

    def test_against_scipy(self, rng):
        import scipy.signal as ss

        x = rng.standard_normal(22050).astype(np.float32)
        y = resample(x, 22050, 16000)
        # exact rational form: gcd(22050, 16000) = 50
        z = ss.resample_poly(x.astype(np.float64), 16000 // 50, 22050 // 50)
        n = min(len(y), len(z))
        sl = slice(500, n - 500)
        # Different prototype filters -> compare loosely.
        corr = np.corrcoef(y[sl], z[sl])[0, 1]
        assert corr > 0.999


class TestMelMath:
    def test_mel_scale_roundtrip(self):
        f = np.array([0.0, 100.0, 1000.0, 8000.0])
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-9)

    def test_filterbank_shape_and_coverage(self):
        cfg = FrontendConfig()
        fb = mel_filterbank(cfg)
        assert fb.shape == (cfg.n_freqs, cfg.n_mels)
        assert fb.min() >= 0.0
        # Every filter has nonzero mass.
        assert (fb.sum(axis=0) > 0).all()

    def test_log_mel_jax_matches_numpy(self, rng):
        cfg = FrontendConfig()
        x = rng.standard_normal(16000).astype(np.float32) * 0.2
        got = np.asarray(log_mel_jax(x, cfg))
        want = _numpy_log_mel(x, cfg)
        assert got.shape == want.shape
        # f32 vs f64 differences are amplified by log() near the floor.
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-3)


class TestMelPallas:
    def test_fused_kernel_matches_reference(self, rng):
        from omnilingual_asr_tpu.ops.mel_pallas import MelFrontend

        cfg = FrontendConfig()
        x = rng.standard_normal(32000).astype(np.float32) * 0.2
        fe = MelFrontend(cfg, interpret=True)
        got = np.asarray(fe(x))
        want = np.asarray(log_mel_jax(x, cfg))
        assert got.shape == want.shape
        # The kernel computes the DFT as a dense f32 matmul; its absolute
        # error is ~1e-4 of frame energy, which blows up log() on near-null
        # bins. Compare in the linear mel domain relative to per-frame peak
        # (the reference browser viewer clips at 70 dB dynamic range anyway,
        # public/static/app.js:2829-2834).
        got_lin, want_lin = np.exp(got), np.exp(want)
        frame_peak = want_lin.max(axis=1, keepdims=True)
        np.testing.assert_allclose(got_lin / frame_peak, want_lin / frame_peak,
                                   atol=2e-3, rtol=5e-2)
        # Log-domain agreement wherever the bin is within 40 dB of peak
        # (the fused f32 dense-DFT has a ~-60 dB noise floor per frame).
        sig = want_lin > frame_peak * 1e-4
        np.testing.assert_allclose(got[sig], want[sig], atol=1e-1)

    def test_short_signal(self):
        from omnilingual_asr_tpu.ops.mel_pallas import MelFrontend

        cfg = FrontendConfig()
        fe = MelFrontend(cfg, interpret=True)
        out = np.asarray(fe(np.zeros(100, np.float32)))
        assert out.shape == (0, cfg.n_mels)


class TestWavRobustness:
    """Malformed-input handling for the RIFF parser (decode must fail
    cleanly, never crash or hang)."""

    def test_truncated_header(self):
        with pytest.raises(ValueError):
            decode_wav_bytes(b"RIFF\x00\x00")

    def test_wrong_magic(self):
        with pytest.raises(ValueError):
            decode_wav_bytes(b"JUNK" + b"\x00" * 100)

    def test_no_data_chunk(self):
        import struct

        buf = b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        buf += b"fmt " + struct.pack("<I", 16)
        buf += struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        with pytest.raises(ValueError):
            decode_wav_bytes(buf)

    def test_data_size_beyond_file(self):
        import struct

        buf = b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        buf += b"fmt " + struct.pack("<I", 16)
        buf += struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        buf += b"data" + struct.pack("<I", 10**6) + b"\x01\x00" * 4
        x, sr = decode_wav_bytes(buf)  # clamps to available bytes
        assert len(x) == 4 and sr == 8000

    def test_weird_chunk_padding(self):
        import struct

        # odd-sized unknown chunk with pad byte before data
        buf = b"RIFF" + struct.pack("<I", 100) + b"WAVE"
        buf += b"fmt " + struct.pack("<I", 16)
        buf += struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        buf += b"LIST" + struct.pack("<I", 3) + b"abc\x00"
        buf += b"data" + struct.pack("<I", 4) + b"\x01\x00\x02\x00"
        x, sr = decode_wav_bytes(buf)
        assert len(x) == 2


def make_aiff_bytes(frames: bytes, sr: int, channels: int = 1,
                    bits: int = 16, compression: bytes = b"") -> bytes:
    """Hand-build an AIFF/AIFC file (no aifc — removed in Python 3.13)."""
    import struct as st

    width = (bits + 7) // 8
    n_frames = len(frames) // (channels * width)
    # 80-bit extended float for sample rate
    exp = 16383 + 63
    mant = sr
    while mant < (1 << 63):
        mant <<= 1
        exp -= 1
    sr80 = st.pack(">HQ", exp, mant)
    comm = st.pack(">HIH", channels, n_frames, bits) + sr80 + compression
    ssnd = st.pack(">II", 0, 0) + frames
    body = b""
    form_type = b"AIFC" if compression else b"AIFF"
    if compression:
        body += b"FVER" + st.pack(">I", 4) + st.pack(">I", 0xA2805140)
    for cid, chunk in ((b"COMM", comm), (b"SSND", ssnd)):
        body += cid + st.pack(">I", len(chunk)) + chunk
        if len(chunk) & 1:
            body += b"\x00"
    return b"FORM" + st.pack(">I", 4 + len(body)) + form_type + body


class TestAiff:
    def test_aiff_roundtrip(self, tmp_path, rng):
        sr = 8000
        x = (rng.standard_normal(sr) * 8000).astype(">i2")
        p = tmp_path / "t.aiff"
        p.write_bytes(make_aiff_bytes(x.tobytes(), sr))
        y, got_sr = decode_audio(p)
        assert got_sr == sr
        np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0,
                                   atol=1e-4)
        assert abs(get_audio_duration(p) - 1.0) < 0.01

    def test_aifc_sowt_little_endian(self, tmp_path, rng):
        sr = 16000
        x = (rng.standard_normal(400) * 8000).astype("<i2")
        p = tmp_path / "t.aiff"
        p.write_bytes(make_aiff_bytes(
            x.tobytes(), sr, compression=b"sowt" + b"\x00"))
        y, got_sr = decode_audio(p)
        assert got_sr == sr
        np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0,
                                   atol=1e-4)

    def test_aiff_stereo_downmix(self, tmp_path):
        sr = 8000
        left = np.full(100, 1000, dtype=">i2")
        right = np.full(100, 3000, dtype=">i2")
        inter = np.empty(200, dtype=">i2")
        inter[0::2] = left
        inter[1::2] = right
        p = tmp_path / "s.aiff"
        p.write_bytes(make_aiff_bytes(inter.tobytes(), sr, channels=2))
        y, got_sr = decode_audio(p)
        assert got_sr == sr and len(y) == 100
        # pure-Python path downmixes by mean; the libav path uses the
        # -3 dB convention (L+R)/sqrt(2). Accept either.
        mean_mix = 2000.0 / 32768.0
        db3_mix = 4000.0 / np.sqrt(2.0) / 32768.0
        const = float(np.mean(y))
        assert np.allclose(y, const, atol=1e-4)
        assert (abs(const - mean_mix) < 1e-3 or abs(const - db3_mix) < 1e-3)

    def test_aiff_duration_header_only(self, tmp_path, rng):
        sr = 8000
        x = (rng.standard_normal(sr * 2) * 100).astype(">i2")
        p = tmp_path / "d.aiff"
        p.write_bytes(make_aiff_bytes(x.tobytes(), sr))
        assert abs(get_audio_duration(p) - 2.0) < 0.01

    def test_unsupported_compression(self, tmp_path):
        p = tmp_path / "c.aiff"
        p.write_bytes(make_aiff_bytes(b"\x00\x00" * 10, 8000,
                                      compression=b"ulaw"))
        import pytest as _pytest
        from omnilingual_asr_tpu.audio import native_lib

        if native_lib.native_available():
            _pytest.skip("native decoder handles compressed AIFC")
        with _pytest.raises(ValueError):
            decode_audio(p)
