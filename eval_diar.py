"""Diarization DER on synthetic multi-speaker mixtures (VERDICT r1 #7).

Builds conversations from the synthetic corpus (2-4 speakers, alternating
turns with optional overlaps/gaps), runs the full engine, and scores DER
(collar-based, Hungarian speaker mapping — utils/metrics.der) of the
engine's diarization against the construction-time ground truth.

    python eval_diar.py --n 8 --ckpt checkpoints/r2/best/asr
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python eval_diar.py --n 2 --tiny     # mechanics on the CPU mesh
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def make_conversation(rng, n_speakers: int, n_turns: int = 10,
                      sr: int = 16000):
    """Returns (samples, ref_turns=[(speaker_label, t0, t1)])."""
    from omnilingual_asr_tpu.train.synth import make_example

    pieces = []
    ref = []
    t = 0.0
    spk_ids = rng.integers(0, 1024, n_speakers)
    for i in range(n_turns):
        who = int(rng.integers(n_speakers))
        ex = make_example(rng, min_words=3, max_words=7, clean=True)
        # re-synthesize with the chosen fixed speaker for consistency
        from omnilingual_asr_tpu.train.synth import synth_utterance

        x = synth_utterance(ex.text, int(spk_ids[who]),
                            seed=int(rng.integers(2**31)))
        gap = float(rng.uniform(0.2, 0.8))
        pieces.append(np.zeros(int(gap * sr), np.float32))
        t += gap
        pieces.append(x)
        ref.append((f"S{who}", t, t + len(x) / sr))
        t += len(x) / sr
    samples = np.concatenate(pieces)
    # light noise so the VAD floor is realistic
    samples = samples + 0.003 * rng.standard_normal(
        len(samples)).astype(np.float32)
    return np.clip(samples, -1, 1), ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="conversations")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--th", default=None,
                    help="AHC threshold override; comma-separated values "
                         "sweep the operating point (each trunk separates "
                         "embeddings differently — the default cut was "
                         "tuned on the r3 d256x4c trunk)")
    ap.add_argument("--count-mode", default=None,
                    choices=["threshold", "eigengap"],
                    help="speaker-count stopping rule override "
                         "(DecodeConfig.count_mode)")
    ap.add_argument("--resegment", action="store_true",
                    help="VBx-style speaker-HMM Viterbi pass over the AHC "
                         "labels (DecodeConfig.resegment)")
    ap.add_argument("--spk-wire", default=None, choices=["f16", "i8"],
                    help="speaker-frame wire dtype override (DecodeConfig"
                         ".spk_wire) — DER-parity check for the int8 wire")
    ap.add_argument("--spk-stride", type=int, default=None,
                    help="speaker-frame device pooling stride override "
                         "(DecodeConfig.spk_frame_stride)")
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import wave

    from omnilingual_asr_tpu.config import config_for_checkpoint, PipelineConfig, tiny_config
    from omnilingual_asr_tpu.engine import TranscriptionEngine
    from omnilingual_asr_tpu.utils.metrics import der

    if args.tiny:
        cfg = tiny_config()
        if args.ckpt:
            cfg = cfg.replace(checkpoint_path=args.ckpt)
    elif args.ckpt:
        # Explicit --ckpt: adopt the checkpoint's own config.json dims and
        # BYPASS release discovery (from_env would impose the installed
        # release's dims on this checkpoint's weights; ADVICE r2 medium).
        cfg = config_for_checkpoint(args.ckpt)
    else:
        cfg = PipelineConfig.from_env()
    def run_battery(threshold):
        import dataclasses

        c = cfg
        dec_over = {}
        if threshold is not None:
            dec_over["ahc_threshold"] = threshold
        if args.count_mode:
            dec_over["count_mode"] = args.count_mode
        if args.resegment:
            dec_over["resegment"] = True
        if args.spk_wire:
            dec_over["spk_wire"] = args.spk_wire
        if args.spk_stride:
            dec_over["spk_frame_stride"] = args.spk_stride
        if dec_over:
            c = cfg.replace(decode=dataclasses.replace(
                cfg.decode, **dec_over))
        engine = TranscriptionEngine(config=c, batch_windows_per_device=4)
        rng = np.random.default_rng(args.seed)
        ders = []
        details = []
        for i in range(args.n):
            n_spk = int(rng.integers(2, 5))
            samples, ref = make_conversation(rng, n_spk)
            path = f"/tmp/omniasr_diar_{i}.wav"
            with wave.open(path, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes((samples * 32767).astype("<i2").tobytes())
            result = engine.transcribe(path)
            # utils/metrics Turn = (start, end, speaker)
            hyp = [(s.start, s.end, s.speaker) for s in result.segments]
            ref_turns = [(t0, t1, spk) for spk, t0, t1 in ref]
            d = der(ref_turns, hyp)
            ders.append(d)
            details.append({"conv": i, "n_spk_ref": n_spk,
                            "n_spk_hyp": len({s.speaker
                                              for s in result.segments}),
                            "der": round(d, 4)})
            os.unlink(path)
        return float(np.mean(ders)), details

    ths = ([float(t) for t in args.th.split(",")] if args.th else [None])
    runs = [(th, *run_battery(th)) for th in ths]
    best_th, best_der, best_details = min(runs, key=lambda r: r[1])
    count_acc = float(np.mean([d["n_spk_ref"] == d["n_spk_hyp"]
                               for d in best_details]))
    report = {
        "metric": "der",
        "value": round(best_der, 4),
        "speaker_count_acc": round(count_acc, 4),
        "count_mode": args.count_mode or "threshold",
        "resegment": bool(args.resegment),
        "n_conversations": args.n,
        "ckpt": args.ckpt,
        "details": best_details,
    }
    if len(runs) > 1 or ths[0] is not None:
        report["ahc_threshold"] = best_th
    if len(runs) > 1:
        report["sweep"] = [{"th": th, "der": round(d, 4)}
                           for th, d, _ in runs]
    print(json.dumps(report))


if __name__ == "__main__":
    main()
