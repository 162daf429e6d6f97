"""Kernel/stage microbenchmarks (informational; the driver metric lives in
bench.py). Prints one JSON line per measurement.

    python bench_kernels.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timeit(fn, *args, reps: int = 10) -> float:
    import jax

    jax.block_until_ready(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/omniasr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from omnilingual_asr_tpu.config import PipelineConfig
    from omnilingual_asr_tpu.ops.mel_pallas import (
        MelFrontend,
        log_mel_frames_pallas,
    )

    cfg = PipelineConfig()
    rng = np.random.default_rng(0)
    out = []

    # --- fused mel kernel: 8 x 30 s of audio -> frames -> mel -------------
    fe = MelFrontend(cfg.frontend)
    T_rows = 8 * 3072
    frames = jnp.asarray(rng.standard_normal((T_rows, cfg.frontend.n_fft)),
                         jnp.float32)

    def mel_fn(f):
        return log_mel_frames_pallas(f, fe.cw, fe.sw, fe.fb, cfg.frontend,
                                     interpret=fe.interpret)

    dt = timeit(jax.jit(mel_fn), frames)
    audio_s = T_rows * cfg.frontend.hop_length / cfg.frontend.sample_rate
    out.append({"metric": "mel_kernel_rtf", "value": round(audio_s / dt, 1),
                "unit": "x_realtime", "seconds": round(dt, 5)})

    # --- flash attention vs XLA attention at T=3072 ------------------------
    from omnilingual_asr_tpu.ops.attention import (
        flash_attention,
        reference_attention,
    )

    B, T, H, D = 8, 768, 8, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    mask = jnp.ones((B, T), bool)
    dt_flash = timeit(lambda a, b, c, m: flash_attention(a, b, c, m),
                      q, k, v, mask)
    dt_xla = timeit(jax.jit(reference_attention), q, k, v, mask)
    out.append({"metric": "flash_attention", "value": round(dt_flash * 1e3, 3),
                "unit": "ms", "xla_ms": round(dt_xla * 1e3, 3),
                "speedup": round(dt_xla / dt_flash, 2)})

    # --- int8 matmul kernels vs bf16 XLA (serving FFN shape) ---------------
    from omnilingual_asr_tpu.ops.quant import (
        quantize_weight,
        quantized_matmul,
        quantized_matmul_a8,
    )

    M, K, N = 4096, 512, 2048
    xq = jnp.asarray(rng.standard_normal((M, K)), jnp.float32) * 0.1
    wf = jnp.asarray(rng.standard_normal((K, N)), jnp.float32) * 0.05
    w_q, w_s = quantize_weight(wf)
    dt_bf16 = timeit(jax.jit(lambda a, b: jnp.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)), xq, wf)
    dt_w8 = timeit(lambda a: quantized_matmul(a, w_q, w_s), xq)
    dt_a8 = timeit(lambda a: quantized_matmul_a8(a, w_q, w_s), xq)
    out.append({"metric": "int8_matmul", "unit": "ms",
                "bf16_ms": round(dt_bf16 * 1e3, 3),
                "w8a16_ms": round(dt_w8 * 1e3, 3),
                "w8a8_ms": round(dt_a8 * 1e3, 3),
                "value": round(dt_a8 * 1e3, 3),
                "a8_speedup_vs_bf16": round(dt_bf16 / dt_a8, 2)})

    # --- full device program (engine._process) -----------------------------
    from omnilingual_asr_tpu.engine import TranscriptionEngine

    eng = TranscriptionEngine(batch_windows_per_device=8)
    rows = (rng.standard_normal((8, eng.window_samples)) * 8000).astype(np.int16)
    sb = jnp.asarray(rows)
    nb = jnp.asarray(np.full(8, eng.valid_frames, np.int32))
    cm = jnp.zeros((cfg.vocab.vocab_size,), jnp.float32)
    dt = timeit(lambda a, b, c: eng._process(eng.params, a, b, c), sb, nb, cm)
    out.append({"metric": "device_program_rtf",
                "value": round(240.0 / dt, 1), "unit": "x_realtime",
                "seconds": round(dt, 4)})

    for row in out:
        print(json.dumps(row), flush=True)
    print(f"# backend={jax.default_backend()}", file=sys.stderr)


if __name__ == "__main__":
    main()
