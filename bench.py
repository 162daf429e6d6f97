"""Headline benchmark: end-to-end real-time factor per chip.

Measures the full pipeline (host decode -> Pallas log-mel -> conformer+heads
-> CTC/LID/emotion/speaker assembly -> diarization clustering) on synthetic
speech-like audio, steady-state (after one warmup pass), on whatever
accelerator is attached.

Prints ONE JSON line:
  {"metric": "rtf_per_chip", "value": N, "unit": "x_realtime",
   "vs_baseline": N / 300}
vs_baseline is against the BASELINE.json north-star target of >=300x
real-time per chip (the reference itself publishes no perf numbers —
BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time
import wave
from pathlib import Path

import numpy as np

AUDIO_SECONDS = 240.0
TARGET_RTF = 300.0


def make_audio(path: Path, seconds: float, sr: int = 16000) -> None:
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    # Speech-like: pitch-modulated harmonics + colored noise + pauses.
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.5 * t)
    x = 0.3 * np.sin(2 * np.pi * f0 * t) + 0.15 * np.sin(2 * np.pi * 2.1 * f0 * t)
    x += 0.05 * rng.standard_normal(len(t))
    gate = (np.sin(2 * np.pi * 0.25 * t) > -0.7).astype(np.float32)
    x = (x * gate * 20000).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


def _backend_probe(budget_s: float = 300.0) -> bool:
    """One tiny device op in a SUBPROCESS under a hard timeout. The axon
    pool claim retry blocks ~25 min when the pool-side lease is orphaned
    or the terminal is down (observed round 3) — without this guard the
    bench hangs past the driver's patience and records nothing."""
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") in ("", "cpu"):
        return True   # CPU runs (CI) have no claim leg
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "x = jnp.ones((128, 128)); print(float((x @ x).sum()))"],
            timeout=budget_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    if not _backend_probe():
        # Fail FAST with an explanatory line instead of hanging: the
        # number is not a perf regression, the accelerator was unreachable.
        print(json.dumps({
            "metric": "rtf_per_chip", "value": 0, "unit": "x_realtime",
            "vs_baseline": 0,
            "error": "TPU backend unreachable (axon pool claim blocked; "
                     "see NEXT.md operational notes)",
        }))
        sys.exit(0)

    import jax

    # Persistent compile cache: repeat bench invocations skip the ~40 s
    # XLA compile in warmup.
    jax.config.update("jax_compilation_cache_dir", "/tmp/omniasr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from omnilingual_asr_tpu.config import PipelineConfig
    from omnilingual_asr_tpu.engine import TranscriptionEngine

    wav = Path("/tmp/omniasr_bench.wav")
    if not wav.exists():
        make_audio(wav, AUDIO_SECONDS)

    # The headline number is ALWAYS the flagship config (code-default
    # d512x12): round-over-round comparability requires a pinned model
    # identity, not whatever checkpoint from_env() happens to discover
    # (VERDICT r2 weak #1 — BENCH_r02 silently measured the tiny release).
    # If the discovered release checkpoint has the flagship dims its
    # trained weights are used; otherwise the flagship runs random-init
    # (identical FLOPs/bytes — a perf measurement, not a quality one).
    cfg = PipelineConfig.from_env()
    flagship = PipelineConfig()
    if (cfg.encoder.d_model, cfg.encoder.n_layers) != (
            flagship.encoder.d_model, flagship.encoder.n_layers):
        cfg = flagship
    engine = TranscriptionEngine(config=cfg, batch_windows_per_device=8)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(engine.params))

    # Warmup (compile + first dispatches; also warms the host<->device link).
    engine.transcribe(wav)
    engine.transcribe(wav)

    # Median of 8 as the headline (typical latency); best-of-8 reported as
    # context — the host<->device link in this environment is a tunnel with
    # high bandwidth variance (observed 1.5x spread between runs), and
    # best-of isolates the hardware from the tunnel's mood.
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        result = engine.transcribe(wav)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    best = min(times)

    rtf = AUDIO_SECONDS / med
    print(json.dumps({
        "metric": "rtf_per_chip",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / TARGET_RTF, 4),
        "model": {"d_model": cfg.encoder.d_model,
                  "n_layers": cfg.encoder.n_layers,
                  "params": n_params,
                  "trained": cfg.checkpoint_path is not None},
    }))
    # Context for humans (stderr, not part of the contract).
    print(f"# backend={jax.default_backend()} devices={len(jax.devices())} "
          f"median={med:.2f}s best={best:.2f}s "
          f"best_rtf={AUDIO_SECONDS / best:.0f}x "
          f"segments={len(result.segments)}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
