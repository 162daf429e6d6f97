"""Diagnose in-conversation diarization: reproduce the engine's
segment-embedding path (CTC segmentation -> speech-weighted stats pooling
-> AHC) on one eval_diar-style conversation and dump the pairwise
distances, so a bad DER can be attributed to segmentation, pooling, or the
clustering threshold.

    JAX_PLATFORMS=cpu python tools/diag_diar.py \
        --ckpt checkpoints/r3_d256x4c/best/asr --n-speakers 3
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--n-speakers", type=int, default=3)
    ap.add_argument("--seed", type=int, default=123)
    args = ap.parse_args()

    os.environ.setdefault("OMNIASR_RELEASE_DIR", "")
    import jax
    import jax.numpy as jnp

    from eval_diar import make_conversation
    from omnilingual_asr_tpu.config import config_for_checkpoint
    from omnilingual_asr_tpu.diarization.cluster import ahc_labels
    from omnilingual_asr_tpu.models.conformer import (
        asr_forward,
        pooled_speaker_embed_np,
    )
    from omnilingual_asr_tpu.models.zoo import load_checkpoint
    from omnilingual_asr_tpu.ops.ctc import segments_from_alignment
    from omnilingual_asr_tpu.ops.mel_pallas import (
        MelFrontend,
        log_mel_frames_pallas,
    )

    cfg = config_for_checkpoint(args.ckpt)
    params = load_checkpoint(args.ckpt, cfg)
    fe = MelFrontend(cfg.frontend)

    rng = np.random.default_rng(args.seed)
    samples, ref = make_conversation(rng, args.n_speakers)
    sub = cfg.encoder.subsample_factor
    frame_dur = cfg.frontend.hop_length * sub / cfg.frontend.sample_rate

    win = len(samples)
    pad = (-win) % (cfg.frontend.hop_length * sub * 8)
    row = np.pad(samples, (0, pad)).astype(np.float32)
    nv = cfg.frontend.frames_for_samples(win)

    @jax.jit
    def fwd(x):
        frames, _ = fe.frames_from_signal(x)
        mel = log_mel_frames_pallas(frames, fe.cw, fe.sw, fe.fb,
                                    cfg.frontend, interpret=fe.interpret)
        mask = jnp.arange(mel.shape[0])[None, :] < nv
        out = asr_forward(params, mel[None], mask, cfg)
        n_real = 1 + cfg.vocab.n_bytes
        ids = jnp.argmax(out["ctc_logits"][..., :n_real], axis=-1)
        return ids[0], out["speaker_frames"][0], out["mask"][0]

    ids, spk_frames, mask = (np.asarray(v) for v in fwd(jnp.asarray(row)))
    nf = int(mask.sum())
    segs = segments_from_alignment(ids[:nf], frame_dur, cfg.vocab, cfg.decode)
    spk_pool = {k: params[k] for k in ("spk_proj",)}

    print(f"ref turns ({args.n_speakers} speakers):")
    for who, t0, t1 in ref:
        print(f"  {who}  {t0:6.2f}-{t1:6.2f}")
    embeds, spans = [], []
    for s in segs:
        span = spk_frames[s.frame_start:s.frame_end]
        w = np.ones(len(span), np.float32)
        e = pooled_speaker_embed_np(spk_pool, span, w)
        embeds.append(e / max(np.linalg.norm(e), 1e-9))
        spans.append((s.start, s.end, s.text[:28]))
    E = np.stack(embeds)
    d = 1.0 - E @ E.T

    # ground-truth speaker per segment by max time overlap
    def truth(t0, t1):
        best, who_best = 0.0, "?"
        for who, r0, r1 in ref:
            ov = max(0.0, min(t1, r1) - max(t0, r0))
            if ov > best:
                best, who_best = ov, who
        return who_best

    gt = [truth(t0, t1) for t0, t1, _ in spans]
    print("\nhyp segments (gt speaker | time | text):")
    for (t0, t1, tx), g in zip(spans, gt):
        print(f"  {g}  {t0:6.2f}-{t1:6.2f}  {tx!r}")

    same = [d[i, j] for i in range(len(E)) for j in range(i + 1, len(E))
            if gt[i] == gt[j]]
    diff = [d[i, j] for i in range(len(E)) for j in range(i + 1, len(E))
            if gt[i] != gt[j]]
    if same and diff:
        print(f"\nsame-speaker seg dist: mean {np.mean(same):.3f} "
              f"max {np.max(same):.3f}")
        print(f"diff-speaker seg dist: mean {np.mean(diff):.3f} "
              f"min {np.min(diff):.3f}")
    for th in (0.2, 0.3, 0.4, 0.45, 0.5, 0.6):
        lab = ahc_labels(E, threshold=th)
        print(f"th={th:.2f}: {lab.max() + 1} clusters  labels={list(lab)}")

    # --- isolated re-embedding: crop each segment's audio and run it
    # through its own forward pass (no cross-segment attention) ---
    seg_win = 10 * cfg.frontend.sample_rate

    @jax.jit
    def fwd_seg(x, n_valid):
        frames, _ = fe.frames_from_signal(x)
        mel = log_mel_frames_pallas(frames, fe.cw, fe.sw, fe.fb,
                                    cfg.frontend, interpret=fe.interpret)
        mask = jnp.arange(mel.shape[0])[None, :] < n_valid
        out = asr_forward(params, mel[None], mask, cfg)
        return out["speaker_frames"][0], out["mask"][0]

    E2 = []
    sr = cfg.frontend.sample_rate
    for (t0, t1, _) in spans:
        a, b = int(t0 * sr), int(t1 * sr)
        crop = np.zeros(seg_win, np.float32)
        n = min(b - a, seg_win)
        crop[:n] = samples[a:a + n]
        nv2 = cfg.frontend.frames_for_samples(n)
        fr, mk = (np.asarray(v) for v in fwd_seg(jnp.asarray(crop), nv2))
        e = pooled_speaker_embed_np(spk_pool, fr, mk.astype(np.float32))
        E2.append(e / max(np.linalg.norm(e), 1e-9))
    E2 = np.stack(E2)
    d2 = 1.0 - E2 @ E2.T
    same2 = [d2[i, j] for i in range(len(E2)) for j in range(i + 1, len(E2))
             if gt[i] == gt[j]]
    diff2 = [d2[i, j] for i in range(len(E2)) for j in range(i + 1, len(E2))
             if gt[i] != gt[j]]
    print(f"\n[isolated re-embed] same-speaker: mean {np.mean(same2):.3f} "
          f"max {np.max(same2):.3f}")
    print(f"[isolated re-embed] diff-speaker: mean {np.mean(diff2):.3f} "
          f"min {np.min(diff2):.3f}")
    for th in (0.2, 0.3, 0.4, 0.45, 0.5, 0.6):
        lab = ahc_labels(E2, threshold=th)
        print(f"[iso] th={th:.2f}: {lab.max() + 1} clusters "
              f"labels={list(map(int, lab))} gt={gt}")


if __name__ == "__main__":
    main()
