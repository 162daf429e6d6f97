"""Diagnose speaker-embedding separability for a trained checkpoint.

Synthesizes utterances from K known speakers, runs the encoder forward
(CPU-friendly: direct model apply, no engine/mesh), stats-pools segment
embeddings, and reports intra- vs inter-speaker cosine distance
distributions plus the AHC accuracy at a sweep of thresholds. This tells
us whether a bad DER (eval_diar.py) is a weak-embedding problem or a
clustering-threshold problem.

    JAX_PLATFORMS=cpu python tools/diag_speaker.py \
        --ckpt checkpoints/r3_d256x4c/best/asr --n-speakers 6 --per 4
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--n-speakers", type=int, default=6)
    ap.add_argument("--per", type=int, default=4, help="utterances/speaker")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    os.environ.setdefault("OMNIASR_RELEASE_DIR", "")
    import jax
    import jax.numpy as jnp

    from omnilingual_asr_tpu.config import config_for_checkpoint
    from omnilingual_asr_tpu.diarization.cluster import ahc_labels
    from omnilingual_asr_tpu.models.conformer import (
        asr_forward,
        pooled_speaker_embed_np,
    )
    from omnilingual_asr_tpu.models.zoo import load_checkpoint
    from omnilingual_asr_tpu.ops.mel_pallas import (
        MelFrontend,
        log_mel_frames_pallas,
    )
    from omnilingual_asr_tpu.train.synth import make_example, synth_utterance

    cfg = config_for_checkpoint(args.ckpt)
    params = load_checkpoint(args.ckpt, cfg)
    fe = MelFrontend(cfg.frontend)

    @jax.jit
    def spk_frames(samples, n_valid):
        frames, _ = fe.frames_from_signal(samples)
        mel = log_mel_frames_pallas(frames, fe.cw, fe.sw, fe.fb,
                                    cfg.frontend, interpret=fe.interpret)
        mask = jnp.arange(mel.shape[0])[None, :] < n_valid
        out = asr_forward(params, mel[None], mask, cfg)
        return out["speaker_frames"][0], out["mask"][0]

    rng = np.random.default_rng(args.seed)
    spk_ids = rng.integers(0, 1024, args.n_speakers)

    embeds, who = [], []
    win = 4 * 16000
    for si, sid in enumerate(spk_ids):
        for _ in range(args.per):
            ex = make_example(rng, min_words=3, max_words=6, clean=True)
            x = synth_utterance(ex.text, int(sid),
                                seed=int(rng.integers(2**31)))
            row = np.zeros(win, np.float32)
            n = min(len(x), win)
            row[:n] = x[:n]
            nv = cfg.frontend.frames_for_samples(n)
            frames, mask = spk_frames(jnp.asarray(row), nv)
            frames = np.asarray(frames, np.float32)
            wts = np.asarray(mask, np.float32)
            emb = pooled_speaker_embed_np(params, frames, wts)
            embeds.append(emb / max(np.linalg.norm(emb), 1e-9))
            who.append(si)
    E = np.stack(embeds)
    who = np.asarray(who)

    d = 1.0 - E @ E.T
    intra, inter = [], []
    for i, j in itertools.combinations(range(len(E)), 2):
        (intra if who[i] == who[j] else inter).append(float(d[i, j]))
    intra, inter = np.asarray(intra), np.asarray(inter)
    print(f"intra-speaker dist: mean {intra.mean():.3f}  p90 "
          f"{np.percentile(intra, 90):.3f}  max {intra.max():.3f}")
    print(f"inter-speaker dist: mean {inter.mean():.3f}  p10 "
          f"{np.percentile(inter, 10):.3f}  min {inter.min():.3f}")
    overlap = float((intra[:, None] >= inter[None, :]).mean())
    print(f"pairwise order-violation rate (EER-ish): {overlap:.3f}")

    from scipy.optimize import linear_sum_assignment  # noqa: F401 (avail check)
    for th in (0.2, 0.3, 0.4, 0.45, 0.5, 0.6, 0.7, 0.8):
        lab = ahc_labels(E, threshold=th)
        # cluster purity against ground truth
        n_clusters = lab.max() + 1
        correct = 0
        for c in range(n_clusters):
            vals, counts = np.unique(who[lab == c], return_counts=True)
            correct += counts.max()
        print(f"th={th:.2f}: clusters={n_clusters} "
              f"(true {args.n_speakers}) purity={correct / len(E):.3f}")


if __name__ == "__main__":
    main()
