"""Recompute the text-translator held-out accuracies from a SAVED checkpoint.

Round-5 stage T hit a layout trap: ``text_translator_train`` saves its best
params with orbax directly at ``--out``, and orbax REPLACES the target
directory — which also held the run's ``metrics.jsonl``. The queue's ship
gate then read acc 0.0 from the vanished log and declined to ship a
translator whose last in-run eval was noisy word-acc 0.91.

The held-out sets are fully deterministic (text_translator_train.py:359-373:
one ``default_rng(seed+10_000)`` stream consumed in a fixed order, plus the
hash/template split inside ``real_pairs.build_real_corpus``), so they can be
rebuilt bit-exactly and the saved checkpoint re-measured after the fact:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python tools/translator_reval.py --ckpt checkpoints/r5_translator \
            --out evals/r5/translation.json --ship-gate 0.8

Emits the same artifact schema as tools/translation_artifact.py; with
``--ship-gate`` it also exports ``checkpoints/release/translator.npz`` when
the noisy accuracy clears the gate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/r5_translator")
    ap.add_argument("--out", default="evals/r5/translation.json")
    ap.add_argument("--n-eval", type=int, default=256,
                    help="must match the training run (default matches)")
    ap.add_argument("--seed", type=int, default=0,
                    help="must match the training run (default matches)")
    ap.add_argument("--ship-gate", type=float, default=None,
                    help="export checkpoints/release/translator.npz when "
                         "noisy word acc >= this")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from omnilingual_asr_tpu.config import PipelineConfig
    from omnilingual_asr_tpu.models.translation import (MAX_SOURCE_LEN,  # noqa: F401
                                                        load_translator,
                                                        tokens_to_text,
                                                        translate_text)
    from omnilingual_asr_tpu.train.synth import LEXICON_SIZE
    from omnilingual_asr_tpu.train.text_translator_train import (
        MAX_TGT_BYTES, _grammar_tables, _lang_tables, ctc_noise, draw_pair,
        draw_grammar_pair, encode_pair, word_accuracy)

    cfg = PipelineConfig.from_env()
    vocab = cfg.vocab
    params = load_translator(args.ckpt, cfg, n_layers=4)

    tables, english = _lang_tables()
    gtables = _grammar_tables(tables, english)
    try:
        from omnilingual_asr_tpu.train.real_pairs import (build_real_corpus,
                                                          draw_real_pair)

        real = build_real_corpus()
        if not real["n_train"]:
            real = None
    except ImportError:
        real = None

    # EXACT replay of the trainer's held-out construction: one rng stream,
    # same consumption order (pairs -> noise -> grammar -> real).
    ev_rng = np.random.default_rng(args.seed + 10_000)
    ev_pairs = [draw_pair(ev_rng, tables, english, LEXICON_SIZE, gtables)
                for _ in range(args.n_eval)]
    ev_noisy = [(ctc_noise(ev_rng, s), t) for s, t in ev_pairs]
    ev_gram = [draw_grammar_pair(ev_rng, gtables) for _ in range(args.n_eval)]
    ev_real = ([draw_real_pair(ev_rng, real, "heldout")
                for _ in range(args.n_eval)] if real else [])

    def encode_eval(pairs):
        rows = [encode_pair(s, t, vocab) for s, t in pairs]
        cols = tuple(jnp.asarray(np.stack(c)) for c in zip(*rows))
        return cols[0], cols[1]

    def eval_acc(ids_mask, refs) -> float:
        ids, mask = ids_mask
        ok = words = 0
        B = 64
        for b0 in range(0, ids.shape[0], B):
            toks = np.asarray(translate_text(
                params, ids[b0:b0 + B], mask[b0:b0 + B], cfg,
                max_len=MAX_TGT_BYTES))
            for j in range(toks.shape[0]):
                hyp = tokens_to_text(toks[j], vocab)
                a, b = word_accuracy(hyp, refs[b0 + j][1])
                ok += a
                words += b
        return ok / max(words, 1)

    acc_c = eval_acc(encode_eval(ev_pairs), ev_pairs)
    acc_n = eval_acc(encode_eval(ev_noisy), ev_noisy)
    acc_g = eval_acc(encode_eval(ev_gram), ev_gram)
    acc_r = eval_acc(encode_eval(ev_real), ev_real) if ev_real else None

    out = {
        "metric": "translation_word_acc",
        "step": None,   # re-measured from the saved best checkpoint
        "cipher": round(acc_c, 4),
        "cipher_noisy": round(acc_n, 4),
        "grammar": round(acc_g, 4),
        "real_heldout": round(acc_r, 4) if acc_r is not None else None,
        "real_corpus": ({"n_train": real["n_train"],
                         "n_heldout": real["n_heldout"],
                         "n_languages": len(real["languages"])}
                        if real else None),
        "split": "template",
        "source_metrics": f"reval:{args.ckpt}",
    }
    outp = Path(args.out)
    outp.parent.mkdir(parents=True, exist_ok=True)
    outp.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))

    if args.ship_gate is not None and acc_n >= args.ship_gate:
        from omnilingual_asr_tpu.models.zoo import save_release

        save_release("checkpoints/release/translator.npz", params)
        print(f"shipped checkpoints/release/translator.npz "
              f"(noisy {acc_n:.4f} >= gate {args.ship_gate})")


if __name__ == "__main__":
    main()
