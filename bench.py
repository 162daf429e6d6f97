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

    def is_flagship(c: PipelineConfig) -> bool:
        # Full model-defining identity, not just (d_model, n_layers): a
        # seed with non-default heads/ffn/MoE/frontend/vocab would change
        # FLOPs and bytes and silently break round-over-round
        # comparability (frozen dataclasses compare by value).
        return (c.encoder == flagship.encoder
                and c.frontend == flagship.frontend
                and c.vocab == flagship.vocab)

    weights_src = "release" if cfg.checkpoint_path else "random"
    if not is_flagship(cfg):
        # The discovered release is not flagship-sized. Before falling back
        # to random-init, look for a committed flagship training seed
        # (asr.npz + self-describing config.json, e.g.
        # checkpoints/r5_d512x12_seed/): trained weights at identical
        # FLOPs/bytes make the headline measure a real model honestly.
        cfg, weights_src = flagship, "random"
        # Repo-root-relative (like zoo.default_release_dir) so running
        # bench.py from another CWD still finds committed seeds; name-
        # descending order is deterministic across clones (git does not
        # preserve mtimes) and prefers the newest round's seed.
        ckpt_root = Path(__file__).resolve().parent / "checkpoints"
        candidates = sorted(
            (p for p in ckpt_root.glob("*/config.json")
             if (p.parent / "asr.npz").is_file()),
            key=lambda p: p.parent.name, reverse=True)
        for cj in candidates:
            try:
                seed_cfg = PipelineConfig.from_json(
                    cj.read_text(),
                    checkpoint_path=str(cj.parent / "asr.npz"))
            except Exception:
                continue
            if is_flagship(seed_cfg):
                cfg, weights_src = seed_cfg, f"seed:{cj.parent.name}"
                break

    def measure(batch_windows: int, ingress: str, reps: int = 8,
                decode_overrides: dict | None = None):
        """End-to-end RTF for one serving configuration (median of reps)."""
        import dataclasses as _dc

        mcfg = cfg
        if decode_overrides:
            mcfg = cfg.replace(
                decode=_dc.replace(cfg.decode, **decode_overrides))
        engine = TranscriptionEngine(config=mcfg,
                                     batch_windows_per_device=batch_windows,
                                     ingress=ingress)
        engine.transcribe(wav)   # compile + link warmup
        engine.transcribe(wav)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            result = engine.transcribe(wav)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        stages = (dict(engine.last_trace.stages)
                  if engine.last_trace is not None else {})
        return {
            "batch_windows": batch_windows, "ingress": ingress,
            "decode": decode_overrides or {},
            # spk wire/stride change the shipped embeddings; they only
            # become the headline after a measured DER-parity flip of the
            # DecodeConfig defaults.
            "quality_neutral": not decode_overrides,
            "median_s": round(med, 4), "best_s": round(min(times), 4),
            "rtf": round(AUDIO_SECONDS / med, 1),
            "stages_s": {k: round(v, 4) for k, v in stages.items()},
        }, engine, result

    # r02/r03 reported the IDENTICAL link-bound median regardless of model
    # size (VERDICT r3 weak #3) — the wall is H2D/D2H over the tunnel, not
    # FLOPs. Sweep the two link levers: mu-law ingress (halves H2D bytes)
    # and batch granularity (smaller batches pipeline H2D/compute/D2H
    # across the windows of one file instead of one serial mega-batch).
    headline, engine, result = measure(8, "i16")    # pinned r02/r03 config
    sweeps = [headline]
    for bw, ing, dec in (
            (8, "mulaw", None),
            (4, "i16", None),          # 2 batches: H2D/compute/D2H overlap
            (4, "mulaw", None),
            (8, "i16", {"spk_wire": "i8"}),
            (8, "i16", {"spk_wire": "i8", "spk_frame_stride": 2}),
            (4, "i16", {"spk_wire": "i8", "spk_frame_stride": 2})):
        try:
            sweeps.append(measure(bw, ing, decode_overrides=dec)[0])
        except Exception as e:  # pragma: no cover — keep the headline alive
            print(f"# sweep ({bw},{ing},{dec}) failed: {e}", file=sys.stderr)
    neutral = [r for r in sweeps if r["quality_neutral"]]
    tuned = max(neutral, key=lambda r: r["rtf"])
    tuned_any = max(sweeps, key=lambda r: r["rtf"])

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(engine.params))

    # --- where the time goes: device step time, link bandwidth, MFU ------
    # Device-only step: stage one batch's inputs on device, then time the
    # fused program with outputs LEFT on device (no D2H in the loop).
    diag = {}
    try:
        import jax.numpy as jnp

        from omnilingual_asr_tpu.models.orthography import ctc_logit_mask

        rows = np.zeros((engine.batch_size, engine.window_samples),
                        np.int16)
        rng = np.random.default_rng(0)
        rows[:] = (rng.standard_normal(rows.shape) * 3000).astype(np.int16)
        samples_b = jax.device_put(jnp.asarray(rows))
        nvalid_b = jax.device_put(jnp.full(
            (engine.batch_size,), engine.window_frames, jnp.int32))
        cmask = jnp.asarray(ctc_logit_mask(None, cfg.vocab))
        out = engine._process(engine.params, samples_b, nvalid_b, cmask)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n_it = 10
        for _ in range(n_it):
            out = engine._process(engine.params, samples_b, nvalid_b, cmask)
        jax.block_until_ready(out)
        device_step_s = (time.perf_counter() - t0) / n_it
        batch_audio_s = engine.batch_size * engine.window_samples / 16000.0
        diag["device_step_s"] = round(device_step_s, 4)
        diag["device_rtf"] = round(batch_audio_s / device_step_s, 1)

        # XLA's own FLOP count for the fused program -> MFU estimate.
        try:
            comp = engine._process.lower(
                engine.params, samples_b, nvalid_b, cmask).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) if ca else 0.0
            if flops > 0:
                peaks = {"TPU v5 lite": 197e12, "TPU v5e": 197e12,
                         "TPU v4": 275e12, "TPU v6 lite": 918e12}
                kind = jax.devices()[0].device_kind
                peak = peaks.get(kind)
                diag["flops_per_batch"] = flops
                if peak:
                    diag["mfu"] = round(flops / device_step_s / peak, 4)
        except Exception:
            pass

        # Host<->device link bandwidth (the suspected wall).
        payload = np.zeros(8 << 20, np.uint8)
        t0 = time.perf_counter()
        dev = jax.device_put(payload)
        jax.block_until_ready(dev)
        diag["h2d_mb_s"] = round(8 / (time.perf_counter() - t0), 1)
        t0 = time.perf_counter()
        _ = np.asarray(dev)
        diag["d2h_mb_s"] = round(8 / (time.perf_counter() - t0), 1)
    except Exception as e:  # pragma: no cover
        print(f"# diagnostics failed: {e}", file=sys.stderr)

    rtf = tuned["rtf"]
    print(json.dumps({
        "metric": "rtf_per_chip",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / TARGET_RTF, 4),
        "headline_i16_b8_rtf": headline["rtf"],   # r02/r03-comparable row
        "tuned": {"batch_windows": tuned["batch_windows"],
                  "ingress": tuned["ingress"]},
        "tuned_lossy": {"batch_windows": tuned_any["batch_windows"],
                        "ingress": tuned_any["ingress"],
                        "decode": tuned_any["decode"],
                        "rtf": tuned_any["rtf"]},
        "sweep": sweeps,
        "diag": diag,
        "model": {"d_model": cfg.encoder.d_model,
                  "n_layers": cfg.encoder.n_layers,
                  "params": n_params,
                  "trained": cfg.checkpoint_path is not None,
                  "weights": weights_src},
    }))
    # Context for humans (stderr, not part of the contract).
    print(f"# backend={jax.default_backend()} devices={len(jax.devices())} "
          f"tuned_median={tuned['median_s']:.2f}s "
          f"headline_median={headline['median_s']:.2f}s "
          f"segments={len(result.segments)}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
