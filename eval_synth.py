"""End-to-end WER/CER on the held-out synthetic corpus + real gettysburg
windows, THROUGH the product engine (decode -> windows -> full schema), not
the trainer's internal evaluator. This is the measured-quality companion to
the trained checkpoint (VERDICT r1 #2): no public corpus can be fetched in
this environment (zero egress), so held-out synthetic speech — disjoint
seed space from every training stream — plus the reference's own bundled
recording (reference gettysburg.wav + word-aligned gettysburg.eaf) stand in
for FLEURS until a manifest is mounted (eval/manifests.py then applies).

    python eval_synth.py --ckpt checkpoints/synth_r2/best/asr --n 96
    JAX_PLATFORMS=cpu python eval_synth.py --tiny --n 4   # mechanics check
"""

from __future__ import annotations

import argparse
import json
import wave
from pathlib import Path

import numpy as np


def write_wav(path: Path, samples: np.ndarray, sr: int = 16000) -> None:
    x = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


def build_manifest(out_dir: Path, n_synth: int, include_real: bool) -> Path:
    from omnilingual_asr_tpu.train.synth import eval_set, real_corpus

    out_dir.mkdir(parents=True, exist_ok=True)
    lines = []
    for i, ex in enumerate(eval_set(n_synth)):
        if not ex.text:
            continue
        p = out_dir / f"synth_{i:04d}.wav"
        write_wav(p, ex.samples)
        lines.append({"audio": p.name, "text": ex.text,
                      "language": ex.language, "set": "synth"})
    if include_real:
        _, real_eval = real_corpus(window_s=30.0)
        for i, w in enumerate(real_eval):
            if w["language"] != "English" or not w["text"]:
                continue
            p = out_dir / f"gettysburg_heldout_{i:02d}.wav"
            write_wav(p, w["samples"])
            lines.append({"audio": p.name, "text": w["text"],
                          "language": "English", "set": "gettysburg"})
    manifest = out_dir / "manifest.jsonl"
    manifest.write_text("\n".join(json.dumps(l) for l in lines) + "\n")
    return manifest


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt", default=None, help="trained ASR checkpoint")
    ap.add_argument("--n", type=int, default=96, help="synthetic files")
    ap.add_argument("--out", default="/tmp/omniasr_eval_synth")
    ap.add_argument("--no-real", action="store_true")
    ap.add_argument("--window-seconds", type=float, default=10.0)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--ingress", default=None, choices=["i16", "mulaw"],
                    help="H2D wire format (audio/codec.py); quantifies the "
                         "WER cost of 8-bit companded ingress")
    ap.add_argument("--quantize", default="none",
                    choices=["none", "int8", "w8", "a8"],
                    help="serve quantized and measure the WER delta vs "
                         "bf16: int8 = dequant path (quantize=True), "
                         "w8/a8 = Pallas W8A16/W8A8 kernels (TPU only; "
                         "a8 does dynamic per-token activation quant "
                         "in-kernel, no calibration needed)")
    ap.add_argument("--beam", type=int, default=None,
                    help="prefix-beam size (default: config, 1 = greedy)")
    ap.add_argument("--lm-alpha", type=float, default=None,
                    help="lexicon-LM shallow-fusion weight (ops/lexicon.py)")
    ap.add_argument("--word-bonus", type=float, default=None,
                    help="per-word insertion bonus for LM fusion")
    ap.add_argument("--lexicon", default=None,
                    help="DecodeConfig.lexicon override ('synth', "
                         "'synth_bigram', or a word-list path)")
    args = ap.parse_args()

    from omnilingual_asr_tpu.config import config_for_checkpoint, PipelineConfig, tiny_config
    from omnilingual_asr_tpu.engine import TranscriptionEngine
    from omnilingual_asr_tpu.eval.harness import evaluate, load_manifest

    manifest = build_manifest(Path(args.out), args.n,
                              include_real=not args.no_real)

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
    if (args.beam is not None or args.lm_alpha is not None
            or args.word_bonus is not None or args.lexicon is not None):
        import dataclasses

        dec = cfg.decode
        if args.beam is not None:
            dec = dataclasses.replace(dec, beam_size=args.beam)
        if args.lm_alpha is not None:
            dec = dataclasses.replace(dec, lm_alpha=args.lm_alpha)
        if args.word_bonus is not None:
            dec = dataclasses.replace(dec, lm_word_bonus=args.word_bonus)
        if args.lexicon is not None:
            dec = dataclasses.replace(dec, lexicon=args.lexicon)
        cfg = dataclasses.replace(cfg, decode=dec)
    quantize = {"none": False, "int8": True,
                "w8": "w8", "a8": "a8"}[args.quantize]
    engine = TranscriptionEngine(config=cfg,
                                 window_seconds=args.window_seconds,
                                 ingress=args.ingress,
                                 quantize=quantize)

    # Per-set reports (synthetic vs real speech), one engine.
    items = load_manifest(manifest)
    sets = sorted({i["set"] for i in items})
    out = {}
    for name in sets:
        sub = Path(args.out) / f"manifest_{name}.jsonl"
        sub.write_text("\n".join(
            json.dumps(i) for i in items if i["set"] == name) + "\n")
        rep = evaluate(engine, sub)
        out[name] = {"wer": round(rep.wer, 4), "cer": round(rep.cer, 4),
                     "rtf": round(rep.rtf, 1), "n_files": rep.n_files,
                     "n_ref_words": rep.n_ref_words}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
