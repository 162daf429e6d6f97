"""Int8 quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from omnilingual_asr_tpu.ops.quant import (
    dequantize_weight,
    quantization_error,
    quantize_param_tree,
    quantize_weight,
    quantized_matmul,
)


class TestQuantize:
    def test_roundtrip_error_small(self, rng):
        w = jnp.asarray(rng.standard_normal((256, 512)), jnp.float32) * 0.05
        err = quantization_error(w)
        assert err < 0.01, err

    def test_per_channel_scales(self, rng):
        w = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
        w = w.at[:, 0].multiply(100.0)  # one hot channel
        w_q, scale = quantize_weight(w)
        assert w_q.dtype == jnp.int8
        back = dequantize_weight(w_q, scale)
        # the hot channel must not wreck the others' precision
        rel = np.abs(np.asarray(back[:, 1:] - w[:, 1:])).max() / np.abs(
            np.asarray(w[:, 1:])).max()
        assert rel < 0.02

    def test_quantized_matmul_matches_dequant(self, rng):
        M, K, N = 256, 128, 512
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32) * 0.1
        w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32) * 0.05
        w_q, scale = quantize_weight(w)
        got = np.asarray(quantized_matmul(x, w_q, scale, interpret=True))
        want = np.asarray(x.astype(jnp.bfloat16) @ dequantize_weight(
            w_q, scale).astype(jnp.bfloat16), dtype=np.float32)
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=5e-2)

    def test_quantize_param_tree(self):
        from omnilingual_asr_tpu.config import tiny_config
        from omnilingual_asr_tpu.models.conformer import asr_init

        cfg = tiny_config()
        params = asr_init(jax.random.PRNGKey(0), cfg)
        q = quantize_param_tree(params)
        blk = q["blocks"][0]["ffn1"]["w1"]
        assert "w_q" in blk and blk["w_q"].dtype == jnp.int8
        assert "w_scale" in blk
        assert "w" not in blk
        # depthwise conv kernel [K, D] is 2-D but lives under key "dw",
        # not {"w": ...}; it stays fp32
        assert q["blocks"][0]["conv"]["dw"].dtype == jnp.float32
        # layernorms untouched
        assert q["in_ln"]["scale"].dtype == jnp.float32


class TestQuantizedEngine:
    def test_quantized_engine_transcribes(self, tmp_path, rng):
        import wave

        import jax

        from omnilingual_asr_tpu.config import tiny_config
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        p = tmp_path / "q.wav"
        x = (np.sin(np.arange(16000) * 0.08) * 15000).astype("<i2")
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(x.tobytes())
        eng = TranscriptionEngine(config=tiny_config(), quantize=True,
                                  batch_windows_per_device=1,
                                  window_seconds=5.0)
        # int8 weights actually present on device
        blk = eng.params["blocks"][0]["ffn1"]["w1"]
        assert blk["w_q"].dtype == jnp.int8
        res = eng.transcribe(p)
        assert res is not None  # full pipeline runs with quantized params


class TestW8A8:
    def test_a8_matmul_close_to_f32(self, rng):
        from omnilingual_asr_tpu.ops.quant import quantized_matmul_a8

        x = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((64, 512)), jnp.float32)
        w_q, scale = quantize_weight(w)
        got = np.asarray(quantized_matmul_a8(x, w_q, scale, interpret=True))
        want = np.asarray(x) @ np.asarray(w)
        # dynamic per-token int8 x per-channel int8: ~1% relative error
        denom = np.maximum(np.abs(want), 1.0)
        rel = np.abs(got - want) / denom
        assert rel.mean() < 0.02
        assert np.isfinite(got).all()

    def test_a8_outliers_use_per_row_scale(self, rng):
        """A single huge-magnitude row must not destroy other rows'
        precision (per-token scaling, not per-tensor)."""
        from omnilingual_asr_tpu.ops.quant import quantized_matmul_a8

        x = rng.standard_normal((256, 64)).astype(np.float32)
        x[0] *= 1000.0
        w = jnp.asarray(rng.standard_normal((64, 512)), jnp.float32)
        w_q, scale = quantize_weight(w)
        got = np.asarray(quantized_matmul_a8(jnp.asarray(x), w_q, scale,
                                             interpret=True))
        want = x @ np.asarray(w)
        rel = np.abs(got[1:] - want[1:]) / np.maximum(np.abs(want[1:]), 1.0)
        assert rel.mean() < 0.02


class TestQuantKernelWiring:
    """The Pallas quant kernels wired into dense_apply (set_quant_kernel)."""

    def test_dense_apply_a8_matches_dequant_path(self, rng):
        from omnilingual_asr_tpu.models import layers as L

        p = {"w": jnp.asarray(rng.standard_normal((128, 512)),
                              jnp.float32) * 0.05,
             "b": jnp.asarray(rng.standard_normal(512), jnp.float32)}
        qp = quantize_param_tree({"d": p})["d"]
        x = jnp.asarray(rng.standard_normal((3, 70, 128)), jnp.float32)
        want = np.asarray(L.dense_apply(qp, x))       # dequant + XLA matmul
        L.set_quant_kernel("a8", interpret=True)
        try:
            got = np.asarray(L.dense_apply(qp, x))    # Pallas W8A8 kernel
        finally:
            L.set_quant_kernel(None)
        assert got.shape == want.shape
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1.0)
        assert rel.mean() < 0.02, rel.mean()

    def test_dense_apply_w8_kernel_and_fallback(self, rng):
        from omnilingual_asr_tpu.models import layers as L

        # N=512 tiles the kernel; N=96 must silently fall back.
        for N in (512, 96):
            p = {"w": jnp.asarray(rng.standard_normal((128, N)),
                                  jnp.float32) * 0.05}
            qp = quantize_param_tree({"d": p})["d"]
            x = jnp.asarray(rng.standard_normal((40, 128)), jnp.float32)
            want = np.asarray(L.dense_apply(qp, x))
            L.set_quant_kernel("w8", interpret=True)
            try:
                got = np.asarray(L.dense_apply(qp, x))
            finally:
                L.set_quant_kernel(None)
            rel = np.abs(got - want) / np.maximum(np.abs(want), 1.0)
            assert rel.mean() < 0.02, (N, rel.mean())

    def test_engine_a8_transcribes(self, tmp_path):
        import wave

        from omnilingual_asr_tpu.config import tiny_config
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        p = tmp_path / "a8.wav"
        x = (np.sin(np.arange(16000) * 0.08) * 15000).astype("<i2")
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(x.tobytes())
        eng = TranscriptionEngine(config=tiny_config(), quantize="a8",
                                  batch_windows_per_device=1,
                                  window_seconds=5.0)
        res = eng.transcribe(p)
        assert res is not None

    def test_engine_a8_rejects_tensor_parallel(self):
        import pytest

        from omnilingual_asr_tpu.config import MeshConfig, tiny_config
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        if len(jax.devices()) < 2:
            pytest.skip("needs >=2 devices")
        cfg = tiny_config().replace(mesh=MeshConfig(data=1, model=2))
        with pytest.raises(ValueError, match="model-parallel"):
            TranscriptionEngine(config=cfg, quantize="a8")
