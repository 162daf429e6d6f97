"""Fallback-path tests: pure-Python behavior when the native library is
disabled, zoo configs, distributed no-op."""

import subprocess
import sys
from pathlib import Path

import jax
import pytest

REPO = Path(__file__).resolve().parents[1]


class TestNativeDisabled:
    def test_mp3_duration_estimator_python_path(self, lisu_mp3):
        """OMNIASR_DISABLE_NATIVE forces the pure-Python Xing/CBR estimator
        (audio/decode.py::_mp3_duration_estimate)."""
        code = (
            "from omnilingual_asr_tpu.audio.decode import get_audio_duration;"
            f"print(get_audio_duration({str(lisu_mp3)!r}))"
        )
        out = subprocess.run(
            [sys.executable, "-c", code],
            env={"OMNIASR_DISABLE_NATIVE": "1", "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu"},
            capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stderr[-500:]
        dur = float(out.stdout.strip().splitlines()[-1])
        assert 185 < dur < 200, dur  # ~191.7 s

    def test_wav_python_path(self, gettysburg_wav):
        code = (
            "from omnilingual_asr_tpu.audio.decode import decode_audio;"
            f"x, sr = decode_audio({str(gettysburg_wav)!r});"
            "print(sr, len(x))"
        )
        out = subprocess.run(
            [sys.executable, "-c", code],
            env={"OMNIASR_DISABLE_NATIVE": "1", "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu"},
            capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stderr[-500:]
        sr, n = out.stdout.split()[-2:]
        assert sr == "22050" and n == "387574"


class TestZoo:
    def test_named_configs(self):
        from omnilingual_asr_tpu.models.zoo import base_config, large_config

        b, l = base_config(), large_config()
        assert l.encoder.d_model > b.encoder.d_model
        assert l.encoder.n_layers >= b.encoder.n_layers
        # both tile the MXU
        assert b.encoder.d_model % 128 == 0
        assert l.encoder.d_model % 128 == 0

    def test_param_counts_ordered(self):
        from omnilingual_asr_tpu.config import tiny_config
        from omnilingual_asr_tpu.models.conformer import asr_init, param_count

        tiny = param_count(asr_init(jax.random.PRNGKey(0), tiny_config()))
        assert 1e6 < tiny < 5e7


class TestDistributedNoop:
    def test_single_host_returns_false(self, monkeypatch):
        from omnilingual_asr_tpu.parallel.mesh import init_distributed

        monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
        assert init_distributed() is False
