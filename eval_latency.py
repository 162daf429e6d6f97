"""Batch=1 latency: one 30 s window end-to-end through the engine.

BASELINE.json tracks "RTF at batch=1" alongside throughput (bench.py
measures the batched-throughput number). This is the interactive-serving
figure: a single fixed window (the engine's native unit, engine.py window
batching) dispatched alone — host decode -> Pallas mel -> conformer+heads
-> assembly — reported as median wall latency and its RTF.

    python eval_latency.py                  # real chip, flagship d512x12
    JAX_PLATFORMS=cpu python eval_latency.py --tiny   # mechanics check
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

from bench import make_audio


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--seconds", type=float, default=30.0,
                    help="audio length (default: one engine window)")
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/omniasr_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from omnilingual_asr_tpu.config import PipelineConfig, tiny_config
    from omnilingual_asr_tpu.engine import TranscriptionEngine

    # Same model-identity pinning as bench.py: the latency row is the
    # flagship config regardless of which release from_env() discovers.
    cfg = tiny_config() if args.tiny else PipelineConfig.from_env()
    weights = "release" if cfg.checkpoint_path else "random"
    if not args.tiny:
        flagship = PipelineConfig()
        if (cfg.encoder.d_model, cfg.encoder.n_layers) != (
                flagship.encoder.d_model, flagship.encoder.n_layers):
            # Wall-clock-only measurement: random-init flagship has the
            # identical FLOPs/bytes as a trained one (ADVICE r3: record
            # the provenance instead of silently timing random weights).
            cfg = flagship
            weights = "random"
    engine = TranscriptionEngine(config=cfg, batch_windows_per_device=1)

    wav = Path("/tmp/omniasr_lat.wav")
    make_audio(wav, args.seconds)

    engine.transcribe(wav)  # compile + link warmup
    engine.transcribe(wav)

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        engine.transcribe(wav)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    best = float(min(times))
    print(json.dumps({
        "metric": "batch1_latency_s",
        "audio_s": args.seconds,
        "backend": jax.default_backend(),
        "median_s": round(med, 4),
        "best_s": round(best, 4),
        "rtf_batch1": round(args.seconds / med, 1),
        "model": {"d_model": cfg.encoder.d_model,
                  "n_layers": cfg.encoder.n_layers},
        "weights": weights,
        "reps": args.reps,
    }))


if __name__ == "__main__":
    main()
