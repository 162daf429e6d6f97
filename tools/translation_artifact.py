"""Summarize a text-translator training run into evals/<round>/translation.json
(VERDICT r4 item 7): cipher-corpus, noisy-source, grammar-subset and
real-language template-held-out word accuracies, reported SEPARATELY, plus
the corpus split provenance (real_pairs.build_real_corpus heldout_by).

    python tools/translation_artifact.py \
        --metrics checkpoints/r5_translator/metrics.jsonl \
        --out evals/r5/translation.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", default="checkpoints/r5_translator/metrics.jsonl")
    ap.add_argument("--out", default="evals/r5/translation.json")
    args = ap.parse_args()

    last_eval = {}
    last_step = 0
    p = Path(args.metrics)
    for line in p.read_text().splitlines():
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "eval" in d:
            last_eval = d["eval"]
            last_step = d.get("step", last_step)

    if not last_eval:
        print(f"no eval rows in {p}", file=sys.stderr)
        raise SystemExit(1)

    out = {
        "metric": "translation_word_acc",
        "step": last_step,
        # synthetic cipher corpus (training distribution, clean sources)
        "cipher": last_eval.get("translation_word_acc"),
        # cipher with CTC-like hypothesis noise on the source side
        "cipher_noisy": last_eval.get("translation_word_acc_noisy"),
        # reordering/morphology-only synthetic subset
        "grammar": last_eval.get("translation_word_acc_grammar"),
        # REAL natural-language pairs, held out by whole English target
        # template across all locales (real_pairs.build_real_corpus
        # heldout_by="template") — no near-duplicate leak from sibling
        # locales of the same phrase
        "real_heldout": last_eval.get("translation_word_acc_real_heldout"),
        "real_corpus": last_eval.get("real_corpus"),
        "split": "template",
        "source_metrics": str(p),
    }
    outp = Path(args.out)
    outp.parent.mkdir(parents=True, exist_ok=True)
    outp.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
