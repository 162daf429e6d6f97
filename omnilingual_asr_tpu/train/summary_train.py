"""Free-text summarizer training on synthetic conversations (round-2
follow-up to the neural-summarizer gating: the reference's summaries are
free text, reference gemini_pipeline.py:126-129, while the engine's default
is the schema-exact template).

The decoder (models/summarizer.SummaryDecoder — the 2-layer translation
decoder over pooled encoder states) is trained to DESCRIBE audio: given the
frozen ASR encoder's pooled window states of a multi-speaker synthetic
conversation, emit a sentence stating the speaker count, the language(s)
and the overall tone — the three facts the reference prompt demands of a
summary (gemini_pipeline.py:210). Because the encoder is frozen, each
conversation is encoded ONCE into a memory bank and the decoder trains at
host speed.

    python -m omnilingual_asr_tpu.train.summary_train \
        --ckpt checkpoints/synth_r2/best/asr --steps 4000 \
        --out checkpoints/synth_r2/best/summarizer
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import PipelineConfig, tiny_config
from ..models.conformer import asr_forward
from ..models.translation import (
    decoder_forward,
    greedy_translate,
    save_translator,
    tokens_to_text,
    translator_init,
)
from ..types import EMOTIONS

POOL_SLOTS = 16          # conversations here are <= 16 windows long
MAX_SUMMARY_BYTES = 128


# ---------------------------------------------------------------------------
# Conversations from a reusable utterance pool (host synthesis is the
# single-core bottleneck; composition makes unlimited conversations from a
# bounded pool)
# ---------------------------------------------------------------------------


def build_utterance_pool(rng: np.random.Generator, n: int):
    """n clean utterances with known (samples, language, emotion, speaker)."""
    from .synth import LANGUAGES, lexicon, synth_utterance

    pool = []
    for _ in range(n):
        lang = LANGUAGES[int(rng.integers(len(LANGUAGES)))]
        lex = lexicon(lang)
        idx = np.minimum((rng.pareto(1.2, int(rng.integers(3, 8)))
                          * 12).astype(int), len(lex) - 1)
        text = " ".join(lex[i] for i in idx)
        emotion = EMOTIONS[int(rng.integers(len(EMOTIONS)))]
        # small voice set -> several utterances per speaker, so composed
        # conversations don't repeat one clip per speaker
        speaker = int(rng.integers(48))
        x = synth_utterance(text, speaker, emotion,
                            seed=int(rng.integers(2**31)),
                            rate=float(rng.uniform(0.9, 1.15)))
        pool.append({"samples": x, "language": lang.name,
                     "emotion": emotion, "speaker": speaker})
    return pool


def make_conversation(rng: np.random.Generator, pool,
                      sr: int = 16000) -> Tuple[np.ndarray, Dict]:
    """Compose a conversation from pool utterances.

    Facts are chosen first (n_speakers, 1-2 languages, dominant tone) and
    the pool is filtered to match, so labels are exact by construction.
    """
    langs = sorted({u["language"] for u in pool})
    while True:  # redraw facts until the pool can realize them
        n_speakers = int(rng.integers(1, 5))
        n_langs = int(rng.integers(1, 3))
        conv_langs = list(rng.choice(langs, size=n_langs, replace=False))
        tone = EMOTIONS[int(rng.integers(len(EMOTIONS)))]

        cands = [u for u in pool if u["language"] in conv_langs]
        by_speaker: Dict[int, list] = {}
        for u in cands:
            by_speaker.setdefault(u["speaker"], []).append(u)
        spk_pool = [s for s, us in by_speaker.items()
                    if any(u["emotion"] == tone for u in us)]
        if len(spk_pool) >= n_speakers:
            break
    chosen = list(rng.choice(spk_pool, size=n_speakers, replace=False))

    pieces, used_langs = [], set()
    n_turns = int(rng.integers(max(2, n_speakers), 9))
    for t in range(n_turns):
        who = chosen[t % n_speakers]
        opts = [u for u in by_speaker[who]
                # majority of turns carry the dominant tone
                if (u["emotion"] == tone or rng.random() < 0.25)]
        u = opts[int(rng.integers(len(opts)))]
        used_langs.add(u["language"])
        pieces.append(np.zeros(int(rng.uniform(0.15, 0.5) * sr), np.float32))
        pieces.append(u["samples"])
    samples = np.concatenate(pieces)
    samples = samples + 0.003 * rng.standard_normal(
        len(samples)).astype(np.float32)
    facts = {"n_speakers": n_speakers,
             "languages": sorted(used_langs), "tone": tone}
    return np.clip(samples, -1, 1).astype(np.float32), facts


_TEMPLATES = (
    "A conversation between {n} speakers in {langs}. Overall tone: {tone}.",
    "{n} speakers talk in {langs}; the overall tone is {tone}.",
    "Dialogue with {n} speakers in {langs}. Overall tone: {tone}.",
)
_SINGLE = (
    "A single speaker talks in {langs}. Overall tone: {tone}.",
    "One speaker, speaking {langs}. Overall tone: {tone}.",
)


def summary_text(rng: np.random.Generator, facts: Dict) -> str:
    langs = " and ".join(facts["languages"])
    if facts["n_speakers"] == 1:
        t = _SINGLE[int(rng.integers(len(_SINGLE)))]
    else:
        t = _TEMPLATES[int(rng.integers(len(_TEMPLATES)))]
    return t.format(n=facts["n_speakers"], langs=langs, tone=facts["tone"])


# ---------------------------------------------------------------------------
# Frozen-encoder memory bank
# ---------------------------------------------------------------------------


class WindowEncoder:
    """Jitted frozen-encoder forward: conversation samples -> pooled
    [POOL_SLOTS, D] memory (mean per window, engine pooling semantics —
    models/summarizer.SummaryDecoder.pool_states)."""

    def __init__(self, cfg: PipelineConfig, asr_params, *,
                 window_seconds: float = 8.0, max_windows: int = POOL_SLOTS):
        from ..ops.mel_pallas import MelFrontend, log_mel_frames_pallas

        self.cfg = cfg
        fe = cfg.frontend
        self.window_samples = int(window_seconds * fe.sample_rate)
        self.max_windows = max_windows
        n_frames = fe.frames_for_samples(self.window_samples)
        sub = cfg.encoder.subsample_factor
        self.window_frames = ((n_frames + sub - 1) // sub) * sub
        fe_dev = MelFrontend(cfg.frontend)
        wf = self.window_frames
        self.params = asr_params

        def fwd(params, samples, n_valid):
            frames = jax.vmap(
                lambda x: fe_dev.frames_from_signal(x)[0])(samples)
            B, T_pad, n_fft = frames.shape
            mel = log_mel_frames_pallas(
                frames.reshape(B * T_pad, n_fft), fe_dev.cw, fe_dev.sw,
                fe_dev.fb, cfg.frontend, interpret=fe_dev.interpret)
            mel = mel.reshape(B, T_pad, -1)[:, :wf]
            mask = jnp.arange(wf)[None, :] < n_valid[:, None]
            out = asr_forward(params, mel, mask, cfg)
            m = out["mask"].astype(jnp.float32)[:, :, None]
            mean = (out["encoder_states"] * m).sum(axis=1) \
                / jnp.maximum(m.sum(axis=1), 1.0)
            return mean  # [W, D]

        self._fwd = jax.jit(fwd)

    def encode(self, samples: np.ndarray) -> Tuple[np.ndarray, int]:
        fe = self.cfg.frontend
        W = self.max_windows
        ws = self.window_samples
        n_win = min(W, max(1, -(-len(samples) // ws)))
        x = np.zeros((W, ws), np.float32)
        nv = np.zeros(W, np.int32)
        for i in range(n_win):
            seg = samples[i * ws:(i + 1) * ws]
            x[i, :len(seg)] = seg
            nv[i] = fe.frames_for_samples(len(seg))
        mem = np.array(self._fwd(self.params, jnp.asarray(x),
                                 jnp.asarray(nv)), np.float32)
        mem[n_win:] = 0.0
        return mem, n_win


# ---------------------------------------------------------------------------
# Decoder training
# ---------------------------------------------------------------------------


def encode_summary(text: str, vocab, max_len: int = MAX_SUMMARY_BYTES,
                   n_prefix: int = 0):
    """Teacher-forcing layout; the first ``n_prefix`` target positions (a
    forced fact prefix, models/summarizer.fact_prefix) are excluded from
    the loss — they are always FORCED at decode time, so training capacity
    belongs entirely to the continuation."""
    bs = text.encode("utf-8")[: max_len - 1]
    ids = [vocab.byte_to_id(b) for b in bs]
    inp = np.zeros(max_len, np.int32)          # BOS(0) + ids
    tgt = np.zeros(max_len, np.int32)          # ids + EOS(0)
    msk = np.zeros(max_len, bool)
    inp[1:1 + len(ids)] = ids
    tgt[:len(ids)] = ids
    msk[:len(ids) + 1] = True                  # include EOS position
    msk[:n_prefix] = False
    return inp, tgt, msk


def facts_score(hyp: str, facts: Dict) -> Dict[str, float]:
    """Checkable-fact accuracy of a generated summary."""
    h = hyp.lower()
    n = facts["n_speakers"]
    n_ok = (f"{n} speakers" in h) if n > 1 else (
        "single speaker" in h or "one speaker" in h)
    tone_ok = facts["tone"] in h
    lang_ok = all(lang.lower() in h for lang in facts["languages"])
    return {"speakers": float(n_ok), "tone": float(tone_ok),
            "languages": float(lang_ok),
            "all": float(n_ok and tone_ok and lang_ok)}


def train_summarizer(*, asr_ckpt: str, out_dir: str, steps: int = 4000,
                     batch_size: int = 32, lr: float = 5e-4,
                     pool_size: int = 768, n_train: int = 1200,
                     n_eval: int = 96, seed: int = 0,
                     cfg: Optional[PipelineConfig] = None,
                     log_every: int = 200, facts_conditioning: bool = True):
    from ..models.summarizer import fact_prefix, fact_prefix_ids
    from ..models.zoo import load_checkpoint

    cfg = cfg or PipelineConfig()
    asr_params = load_checkpoint(asr_ckpt, cfg)
    enc = WindowEncoder(cfg, jax.device_put(asr_params))

    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    print(f"synthesizing utterance pool ({pool_size})...", flush=True)
    pool = build_utterance_pool(rng, pool_size)

    print("encoding conversations...", flush=True)
    mems, nvs, inps, tgts, msks, facts_all = [], [], [], [], [], []
    for i in range(n_train + n_eval):
        samples, facts = make_conversation(rng, pool)
        mem, n_win = enc.encode(samples)
        text = summary_text(rng, facts)
        n_prefix = 0
        if facts_conditioning:
            pfx = fact_prefix(n_speakers=facts["n_speakers"],
                              tone=facts["tone"],
                              language_names=facts["languages"])
            n_prefix = len(pfx.encode("utf-8"))
            text = pfx + text
        inp, tgt, msk = encode_summary(text, cfg.vocab, n_prefix=n_prefix)
        mems.append(mem)
        nvs.append(n_win)
        inps.append(inp)
        tgts.append(tgt)
        msks.append(msk)
        facts_all.append(facts)
        if (i + 1) % 200 == 0:
            print(f"  {i + 1}/{n_train + n_eval} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    mems = np.stack(mems)
    nvs = np.asarray(nvs, np.int32)
    inps, tgts, msks = np.stack(inps), np.stack(tgts), np.stack(msks)

    dec = translator_init(jax.random.PRNGKey(seed), cfg, n_layers=2)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(optax.warmup_cosine_decay_schedule(
                         0.0, lr, 200, max(steps, 201), lr * 0.05)))
    opt_state = tx.init(dec)
    n_heads = cfg.encoder.n_heads

    def loss_fn(p, mem, nv, inp, tgt, msk):
        enc_mask = jnp.arange(POOL_SLOTS)[None, :] < nv[:, None]
        logits = decoder_forward(p, inp, mem, enc_mask, cfg, n_heads=n_heads)
        logp = jax.nn.log_softmax(logits, axis=-1)
        pick = jnp.take_along_axis(logp, tgt[:, :, None], axis=-1)[:, :, 0]
        m = msk.astype(jnp.float32)
        return -(pick * m).sum() / jnp.maximum(m.sum(), 1.0)

    @jax.jit
    def train_step(p, opt_state, mem, nv, inp, tgt, msk):
        loss, grads = jax.value_and_grad(loss_fn)(p, mem, nv, inp, tgt, msk)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    order = np.arange(n_train)
    for s in range(steps):
        if s % max(1, n_train // batch_size) == 0:
            rng.shuffle(order)
        idx = order[(s * batch_size) % n_train:
                    (s * batch_size) % n_train + batch_size]
        if len(idx) < batch_size:
            idx = np.concatenate([idx, order[:batch_size - len(idx)]])
        dec, opt_state, loss = train_step(
            dec, opt_state, jnp.asarray(mems[idx]), jnp.asarray(nvs[idx]),
            jnp.asarray(inps[idx]), jnp.asarray(tgts[idx]),
            jnp.asarray(msks[idx]))
        if (s + 1) % log_every == 0:
            print(json.dumps({"step": s + 1, "ce": round(float(loss), 4)}),
                  flush=True)

    # --- eval: greedy decode, checkable-fact accuracy -------------------
    scores = []
    hyps = []
    for i in range(n_train, n_train + n_eval):
        enc_mask = jnp.arange(POOL_SLOTS)[None, :] < nvs[i]
        forced = None
        n_prefix = 0
        if facts_conditioning:
            # Decode exactly as the engine will: facts forced as a prefix,
            # score only the generated continuation.
            f = facts_all[i]
            pfx_ids = fact_prefix_ids(cfg.vocab, n_speakers=f["n_speakers"],
                                      tone=f["tone"],
                                      language_names=f["languages"])
            n_prefix = len(pfx_ids)
            fa = np.full((1, MAX_SUMMARY_BYTES), -1, np.int32)
            fa[0, :n_prefix] = pfx_ids
            forced = jnp.asarray(fa)
        toks = np.asarray(greedy_translate(
            dec, jnp.asarray(mems[i])[None], enc_mask, cfg,
            max_len=MAX_SUMMARY_BYTES, n_heads=n_heads, forced=forced))
        hyp = tokens_to_text(toks[0, n_prefix:], cfg.vocab).strip()
        hyps.append(hyp)
        scores.append(facts_score(hyp, facts_all[i]))
    agg = {k: round(float(np.mean([s[k] for s in scores])), 4)
           for k in scores[0]}
    print(json.dumps({"eval_fact_accuracy": agg, "n_eval": n_eval}),
          flush=True)
    for h in hyps[:5]:
        print("  e.g.", h, flush=True)

    dec = jax.device_get(dec)
    if facts_conditioning:
        # Marker leaf: tells SummaryDecoder/load_translator this checkpoint
        # expects the forced fact prefix (models/summarizer.fact_conditioned).
        dec = dict(dec)
        dec["fact_cond"] = np.ones((), np.float32)
    save_translator(Path(out_dir), dec)
    print(f"saved summarizer -> {out_dir}", flush=True)
    return agg


def main():
    from ..utils.term import install_sigterm_exit

    install_sigterm_exit()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt", required=True, help="trained ASR checkpoint")
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--pool-size", type=int, default=768)
    ap.add_argument("--n-train", type=int, default=1200)
    ap.add_argument("--n-eval", type=int, default=96)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-facts", action="store_true",
                    help="train WITHOUT fact-prefix conditioning "
                         "(pre-round-3 behavior)")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    from ..config import config_for_checkpoint

    # Adopt the checkpoint's own dims (scale-ladder rungs; ADVICE r2)
    cfg = tiny_config() if args.tiny else config_for_checkpoint(args.ckpt)
    train_summarizer(asr_ckpt=args.ckpt, out_dir=args.out, steps=args.steps,
                     batch_size=args.batch_size, lr=args.lr,
                     pool_size=args.pool_size, n_train=args.n_train,
                     n_eval=args.n_eval, seed=args.seed, cfg=cfg,
                     facts_conditioning=not args.no_facts)


if __name__ == "__main__":
    main()
