"""Train the standalone local-receptive-field speaker embedder
(models/xvector.py) with AAM-softmax over the synthetic speaker space.

The synthetic speaker space (train/synth.py speaker_profile) is hash-
parameterized over ALL ints, so speakers >= N_SPEAKER_CLASSES are truly
held out: eval measures intra/inter-speaker cosine separation and the
pairwise order-violation rate (EER proxy) on speakers the AAM head has
never seen — exactly the generalization diarization needs.

    python -m omnilingual_asr_tpu.train.xvector_train \
        --steps 4000 --batch-size 64 --ckpt-dir checkpoints/xvector

Replaces: the speaker-embedding model of SURVEY §2b's diarization row
(reference outsources diarization wholesale, gemini_pipeline.py:204).
"""

from __future__ import annotations

import argparse
import itertools
import json
import time
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _draw(rng: np.random.Generator, sid: int,
          channel_p: float) -> np.ndarray:
    from .synth import (EMOTIONS, LANGUAGES, LEXICON_SIZE, _channel_sim,
                        lexicon, synth_utterance)

    lang = LANGUAGES[int(rng.integers(len(LANGUAGES)))]
    lex = lexicon(lang)
    n_words = int(rng.integers(2, 7))
    idx = np.minimum((rng.pareto(1.2, n_words) * 12).astype(int),
                     LEXICON_SIZE - 1)
    text = " ".join(lex[i] for i in idx)
    emotion = EMOTIONS[int(rng.integers(len(EMOTIONS)))]
    x = synth_utterance(text, sid, emotion,
                        seed=int(rng.integers(2 ** 31)),
                        snr_db=float(rng.uniform(8.0, 40.0)),
                        rate=float(rng.uniform(0.9, 1.15)),
                        english=lang.is_english)
    if rng.random() < channel_p:
        # Channel/room robustness: diarization must not cluster by
        # acoustic channel instead of voice.
        x = _channel_sim(x, rng)
    return x


def _to_window(x: np.ndarray, win: int,
               rng: np.random.Generator) -> Tuple[np.ndarray, int]:
    if len(x) > win:
        a = int(rng.integers(0, len(x) - win + 1))
        x = x[a:a + win]
    row = np.zeros(win, np.float32)
    row[:len(x)] = x
    return row, len(x)


def train_xvector(*, steps: int, batch_size: int, lr: float = 1e-3,
                  window_seconds: float = 4.0, seed: int = 0,
                  warmup_steps: int = 300, channel_p: float = 0.5,
                  pool_size: int = 4096, reuse_p: float = 0.85,
                  ckpt_dir: Optional[str] = None, log_every: int = 50,
                  eval_every: int = 500,
                  metrics_log: Optional[str] = None):
    from ..config import PipelineConfig
    from ..models.conformer import N_SPEAKER_CLASSES
    from ..models.xvector import save_xvector, xvector_init, xvector_pooled
    from ..ops.mel_pallas import MelFrontend, log_mel_frames_pallas
    from .step import aam_softmax_loss, make_optimizer

    cfg = PipelineConfig()
    fe = cfg.frontend
    fe_dev = MelFrontend(fe)
    win = int(window_seconds * fe.sample_rate)
    n_frames = fe.frames_for_samples(win)
    sub = cfg.encoder.subsample_factor
    wf = ((n_frames + 255) // 256) * 256  # mel Pallas BLOCK_T padding
    wf = ((wf + sub - 1) // sub) * sub

    key = jax.random.PRNGKey(seed)
    params = xvector_init(key, cfg)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"xvector params: {n_params / 1e6:.2f} M", flush=True)
    tx = make_optimizer(lr=lr, warmup_steps=warmup_steps,
                        decay_steps=max(steps, 1000))
    opt_state = tx.init(params)

    def loss_fn(p, samples_i16, n_valid, labels):
        samples = samples_i16.astype(jnp.float32) * (1.0 / 32768.0)
        frames = jax.vmap(
            lambda x: fe_dev.frames_from_signal(x)[0])(samples)
        B, T_pad, n_fft = frames.shape
        mel = log_mel_frames_pallas(
            frames.reshape(B * T_pad, n_fft), fe_dev.cw, fe_dev.sw,
            fe_dev.fb, fe, interpret=fe_dev.interpret)
        mel = mel.reshape(B, T_pad, -1)[:, :wf]
        mask = jnp.arange(wf)[None, :] < n_valid[:, None]
        e = xvector_pooled(p, mel, mask)
        return aam_softmax_loss(e, labels, p["aam"])

    @jax.jit
    def train_step(p, o, samples_i16, n_valid, labels):
        loss, grads = jax.value_and_grad(loss_fn)(
            p, samples_i16, n_valid, labels)
        updates, o = tx.update(grads, o, p)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return p, o, loss

    @jax.jit
    def embed_fn(p, samples_i16, n_valid):
        samples = samples_i16.astype(jnp.float32) * (1.0 / 32768.0)
        frames = jax.vmap(
            lambda x: fe_dev.frames_from_signal(x)[0])(samples)
        B, T_pad, n_fft = frames.shape
        mel = log_mel_frames_pallas(
            frames.reshape(B * T_pad, n_fft), fe_dev.cw, fe_dev.sw,
            fe_dev.fb, fe, interpret=fe_dev.interpret)
        mel = mel.reshape(B, T_pad, -1)[:, :wf]
        mask = jnp.arange(wf)[None, :] < n_valid[:, None]
        return xvector_pooled(p, mel, mask)

    # ---- held-out eval set: UNSEEN speaker ids (>= AAM class count) ----
    ev_rng = np.random.default_rng(999_331)
    ev_sids = [N_SPEAKER_CLASSES + 17 * i for i in range(12)]
    ev_rows, ev_nv, ev_who = [], [], []
    for si, sid in enumerate(ev_sids):
        for _ in range(4):
            x = _draw(ev_rng, sid, channel_p=0.25)
            row, n = _to_window(x, win, ev_rng)
            ev_rows.append(row)
            ev_nv.append(min(fe.frames_for_samples(n), wf))
            ev_who.append(si)
    ev_who = np.asarray(ev_who)

    def run_eval(p) -> dict:
        E = []
        B = batch_size
        for b0 in range(0, len(ev_rows), B):
            chunk = ev_rows[b0:b0 + B]
            nv = ev_nv[b0:b0 + B]
            live = len(chunk)
            while len(chunk) < B:
                chunk.append(np.zeros(win, np.float32))
                nv.append(1)
            wire = np.clip(np.stack(chunk) * 32768.0,
                           -32768, 32767).astype(np.int16)
            e = np.asarray(embed_fn(p, jnp.asarray(wire),
                                    jnp.asarray(np.asarray(nv, np.int32))))
            E.append(e[:live])
        E = np.concatenate(E)
        d = 1.0 - E @ E.T
        intra, inter = [], []
        for i, j in itertools.combinations(range(len(E)), 2):
            (intra if ev_who[i] == ev_who[j] else inter).append(d[i, j])
        intra = np.asarray(intra)
        inter = np.asarray(inter)
        viol = float((intra[:, None] >= inter[None, :]).mean())
        return {"intra_mean": round(float(intra.mean()), 4),
                "inter_mean": round(float(inter.mean()), 4),
                "viol": round(viol, 4)}

    # ---- reuse pool (synthesis is the single-core host's bottleneck) ----
    rng = np.random.default_rng(seed + 1)
    pool: List[Tuple[np.ndarray, int]] = []

    def fresh() -> Tuple[np.ndarray, int]:
        sid = int(rng.integers(N_SPEAKER_CLASSES))
        return _draw(rng, sid, channel_p), sid

    def next_batch():
        rows = np.zeros((batch_size, win), np.float32)
        nv = np.zeros(batch_size, np.int32)
        labels = np.zeros(batch_size, np.int32)
        for i in range(batch_size):
            if pool and (rng.random() < reuse_p or len(pool) >= pool_size):
                x, sid = pool[int(rng.integers(len(pool)))]
            else:
                x, sid = fresh()
                pool.append((x, sid))
                if len(pool) > pool_size:
                    pool.pop(int(rng.integers(len(pool))))
            row, n = _to_window(x, win, rng)
            rows[i] = row
            nv[i] = min(fe.frames_for_samples(n), wf)
            labels[i] = sid
        wire = np.clip(rows * 32768.0, -32768, 32767).astype(np.int16)
        return wire, nv, labels

    out = Path(ckpt_dir) if ckpt_dir else None
    if out:
        out.mkdir(parents=True, exist_ok=True)
    mlog = open(metrics_log, "a") if metrics_log else None
    best_viol = 1.0
    t0 = time.time()
    for step in range(1, steps + 1):
        wire, nv, labels = next_batch()
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(wire), jnp.asarray(nv),
            jnp.asarray(labels))
        if step % log_every == 0:
            rec = {"step": step, "aam": round(float(loss), 4),
                   "steps_per_s": round(step / (time.time() - t0), 2)}
            print(json.dumps(rec), flush=True)
            if mlog:
                mlog.write(json.dumps(rec) + "\n")
                mlog.flush()
        if step % eval_every == 0 or step == steps:
            ev = run_eval(params)
            ev["step"] = step
            print(json.dumps({"eval": ev}), flush=True)
            if mlog:
                mlog.write(json.dumps({"eval": ev}) + "\n")
                mlog.flush()
            if out and ev["viol"] <= best_viol:
                best_viol = ev["viol"]
                save_xvector(out / "xvector.npz", params)
                print(f"saved {out}/xvector.npz (viol {best_viol})",
                      flush=True)
    if mlog:
        mlog.close()
    return params


def main():
    from ..utils.term import install_sigterm_exit

    install_sigterm_exit()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--window-seconds", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--warmup-steps", type=int, default=300)
    ap.add_argument("--channel-p", type=float, default=0.5)
    ap.add_argument("--ckpt-dir", default="checkpoints/xvector")
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--metrics-log", default=None)
    args = ap.parse_args()
    train_xvector(steps=args.steps, batch_size=args.batch_size,
                  lr=args.lr, window_seconds=args.window_seconds,
                  seed=args.seed, warmup_steps=args.warmup_steps,
                  channel_p=args.channel_p, ckpt_dir=args.ckpt_dir,
                  eval_every=args.eval_every, metrics_log=args.metrics_log)


if __name__ == "__main__":
    main()
