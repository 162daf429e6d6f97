"""Offline lexicon-LM fusion sweep: ONE encoder pass per file, host-side
beam re-decodes for every (alpha, beta) point.

The fusion knobs (DecodeConfig.lm_alpha / lm_word_bonus) are read at HOST
decode time (engine._beam_text), not baked into the device program — only
beam_size changes the compiled graph (it gates the ctc_topk output). So a
sweep needs exactly one forward per file: this script memoizes
engine._forward_windows by file path and swaps engine.config between grid
points. Runs fine on CPU (no TPU claim), which is also how it was first
used: round 3's d512 wedge left the TPU pool claim stuck for hours.

    JAX_PLATFORMS= python tools/lm_sweep_offline.py \
        --ckpt checkpoints/r3_d256x4c/best/asr --n 32 --out evals/r3
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--beam", type=int, default=8)
    ap.add_argument("--out", default="evals/r3")
    ap.add_argument("--alphas", default="0.0,0.3,0.6,1.0")
    ap.add_argument("--betas", default="0.0,0.5,1.5")
    ap.add_argument("--lexicons", default="synth",
                    help="comma list of DecodeConfig.lexicon values to "
                         "compare (e.g. 'synth,synth_bigram'); the LM "
                         "cache resets per value")
    ap.add_argument("--workdir", default="/tmp/omniasr_lm_sweep")
    args = ap.parse_args()

    from eval_synth import build_manifest
    from omnilingual_asr_tpu.config import config_for_checkpoint
    from omnilingual_asr_tpu.engine import TranscriptionEngine
    from omnilingual_asr_tpu.eval.harness import evaluate, load_manifest

    cfg = config_for_checkpoint(args.ckpt)
    cfg = dataclasses.replace(cfg, decode=dataclasses.replace(
        cfg.decode, beam_size=args.beam))
    # 10 s windows match eval_synth's default, so the alpha=0 row is
    # comparable to the committed synth/real numbers.
    engine = TranscriptionEngine(config=cfg, window_seconds=10.0)

    # Memoize the device work: every grid point reuses the same encoder
    # outputs; only the host-side prefix beam re-runs.
    fwd = engine._forward_windows
    cache: dict = {}

    def memo_fwd(windows, n_samples_last, orthography=None,
                 batch_progress=None):
        key = (tuple(w[0] for w in windows), n_samples_last, orthography,
               float(windows[0][1][:160].sum()) if len(windows) else 0.0)
        if key not in cache:
            cache[key] = fwd(windows, n_samples_last, orthography,
                             batch_progress)
        return cache[key]

    engine._forward_windows = memo_fwd

    manifest = build_manifest(Path(args.workdir), args.n, include_real=True)
    items = load_manifest(manifest)
    sets = sorted({i["set"] for i in items})
    subs = {}
    for name in sets:
        p = Path(args.workdir) / f"manifest_{name}.jsonl"
        p.write_text("\n".join(
            json.dumps(i) for i in items if i["set"] == name) + "\n")
        subs[name] = p

    out_path = Path(args.out) / "lm_sweep_offline.jsonl"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    results = []
    grid = [(0.0, 0.0)] + [
        (a, b)
        for a in (float(x) for x in args.alphas.split(",")) if a > 0
        for b in (float(x) for x in args.betas.split(","))
    ]
    lexicons = [x.strip() for x in args.lexicons.split(",") if x.strip()]
    with out_path.open("w") as f:
      for lex in lexicons:
        engine._lexicon_lm = None   # rebuild per lexicon mode
        for alpha, beta in grid:
            engine.config = dataclasses.replace(
                engine.config, decode=dataclasses.replace(
                    engine.config.decode, lexicon=lex,
                    lm_alpha=alpha, lm_word_bonus=beta))
            line = {"beam": args.beam, "lexicon": lex,
                    "alpha": alpha, "beta": beta}
            for name, p in subs.items():
                rep = evaluate(engine, p)
                line[name] = {"wer": round(rep.wer, 4),
                              "cer": round(rep.cer, 4),
                              "n_ref_words": rep.n_ref_words}
            print(json.dumps(line), flush=True)
            f.write(json.dumps(line) + "\n")
            results.append(line)

    # headline: best grid point by combined WER
    def score(r):
        return sum(r[name]["wer"] for name in subs)

    best = min(results, key=score)
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
