"""Content-level golden eval: the shipped release vs the reference's own
word-aligned goldens (VERDICT r4 "What's missing" #3 / next-round item 2).

Transcribes the two real recordings the reference bundles —
``/root/reference/gettysburg.wav`` and ``/root/reference/Samuel Speaking
Lisu.mp3`` — with the release engine and scores the *content* against the
reference's own EAF goldens (gettysburg.eaf:1-9, samuel_lisu.eaf):

- WER / CER of the concatenated hypothesis vs the golden word tier, and
- word-alignment quality: hypothesis words are aligned to golden words with
  a sequence matcher over normalized tokens; for every matched word the
  absolute start/end deltas are collected (mean/median reported).

This is exactly the end-to-end check the exporter *format* goldens cannot
provide; the Lisu row is measured honestly even though its golden text is
known-noisy (Gemini-transcribed; see train/synth.py real_corpus notes).

    python tools/real_goldens.py --out evals/r5/real_goldens.json
"""

from __future__ import annotations

import argparse
import difflib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def norm_token(w: str) -> str:
    return "".join(ch for ch in w.lower() if ch.isalnum())


def align_words(gold, hyp):
    """Match hypothesis words to golden words; return per-match |Δt|s.

    gold/hyp: lists of (start_s, end_s, word). Matching runs on normalized
    tokens so punctuation/case differences don't break alignment.
    """
    g_tok = [norm_token(w) for _, _, w in gold]
    h_tok = [norm_token(w) for _, _, w in hyp]
    sm = difflib.SequenceMatcher(a=g_tok, b=h_tok, autojunk=False)
    d_start, d_end = [], []
    n_matched = 0
    for a, b, n in sm.get_matching_blocks():
        for k in range(n):
            gs, ge, _ = gold[a + k]
            hs, he, _ = hyp[b + k]
            d_start.append(abs(hs - gs))
            d_end.append(abs(he - ge))
            n_matched += 1
    return n_matched, d_start, d_end


def score_file(engine, audio: Path, eaf: Path) -> dict:
    from omnilingual_asr_tpu.train.synth import parse_eaf_words
    from omnilingual_asr_tpu.utils.metrics import cer, wer

    gold = parse_eaf_words(eaf)
    ref_text = " ".join(w for _, _, w in gold)

    t0 = time.perf_counter()
    result = engine.transcribe(audio)
    elapsed = time.perf_counter() - t0

    hyp_words = [(w.start, w.end, w.word)
                 for seg in result.segments
                 for w in (seg.words or [])]
    hyp_text = " ".join(seg.text for seg in result.segments).strip()

    n_matched, d_start, d_end = align_words(gold, hyp_words)

    def stats(xs):
        if not xs:
            return None
        xs = sorted(xs)
        return {"mean_s": round(sum(xs) / len(xs), 3),
                "median_s": round(xs[len(xs) // 2], 3),
                "max_s": round(xs[-1], 3)}

    return {
        "audio": audio.name,
        "golden": eaf.name,
        "n_ref_words": len(gold),
        "n_hyp_words": len(hyp_words),
        "wer": round(wer(ref_text, hyp_text), 4),
        "cer": round(cer(ref_text, hyp_text), 4),
        "n_aligned_words": n_matched,
        "aligned_frac": round(n_matched / max(1, len(gold)), 4),
        "abs_dt_start": stats(d_start),
        "abs_dt_end": stats(d_end),
        "ref_text": ref_text,
        "hyp_text": hyp_text,
        "wall_s": round(elapsed, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evals/r5/real_goldens.json")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--ckpt", default=None,
                    help="release dir override (default: auto-discovered)")
    args = ap.parse_args()

    from omnilingual_asr_tpu.config import PipelineConfig
    from omnilingual_asr_tpu.engine import TranscriptionEngine

    if args.ckpt:
        import os

        os.environ["OMNIASR_CHECKPOINT_DIR"] = args.ckpt
    cfg = PipelineConfig.from_env()
    engine = TranscriptionEngine(config=cfg)

    ref = Path(args.reference)
    rows = []
    for audio, eaf in (
            (ref / "gettysburg.wav", ref / "gettysburg.eaf"),
            (ref / "Samuel Speaking Lisu.mp3", ref / "samuel_lisu.eaf")):
        if not (audio.exists() and eaf.exists()):
            print(f"skip {audio.name}: asset missing", file=sys.stderr)
            continue
        rows.append(score_file(engine, audio, eaf))
        r = rows[-1]
        print(f"{r['audio']}: WER {r['wer']} CER {r['cer']} "
              f"aligned {r['n_aligned_words']}/{r['n_ref_words']} "
              f"mean|dt| {r['abs_dt_start']}", file=sys.stderr)

    out = {
        "metric": "real_goldens",
        "model": {"d_model": cfg.encoder.d_model,
                  "n_layers": cfg.encoder.n_layers,
                  "checkpoint": cfg.checkpoint_path},
        "files": rows,
    }
    outp = Path(args.out)
    outp.parent.mkdir(parents=True, exist_ok=True)
    outp.write_text(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "files"}
                     | {"files": [{k: v for k, v in r.items()
                                   if k not in ("ref_text", "hyp_text")}
                                  for r in rows]}))


if __name__ == "__main__":
    main()
