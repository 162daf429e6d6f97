"""Text-mode X->English translator training (models/translation.py "src"
mode).

The reference translates each non-English segment's TRANSCRIPT with its LLM
(reference gemini_pipeline.py:176-179, 208) — translation is a text->text
problem downstream of recognition. The audio-conditioned decoder head was
measured to memorize its frozen-encoder training banks instead of
generalizing (round 3: train CE 2e-4, held-out word acc 0.09), because it
had to re-solve acoustic recognition from 6k fixed examples. This trainer
instead teaches the byte-level seq2seq the synthetic corpus's bijective
word cipher directly:

- batches are drawn ON THE FLY from the lexicons (unlimited fresh pairs —
  nothing to memorize),
- source text is corrupted with CTC-style byte errors (substitution /
  deletion / insertion / space-merge) so the real engine's ~5% CER
  transcripts still translate,
- held-out accuracy is measured on BOTH clean and noisy sources every
  ``--eval-every`` steps and the best-accuracy params ship.

No audio synthesis, no encoder pass: steps are tiny matmuls and the run
takes minutes.

    python -m omnilingual_asr_tpu.train.text_translator_train \
        --out checkpoints/<trunk>/translator --steps 4000
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import PipelineConfig, tiny_config
from ..models.translation import (
    MAX_SOURCE_LEN,
    decoder_forward,
    encode_source,
    save_translator,
    text_translator_init,
    tokens_to_text,
    translate_text,
)

MAX_TGT_BYTES = 128


# ---------------------------------------------------------------------------
# Pair generation (text only)
# ---------------------------------------------------------------------------


def _lang_tables():
    from .synth import ENGLISH_WORDS, LANGUAGES, lexicon

    non_english = [lg for lg in LANGUAGES if not lg.is_english]
    return ([(lg.name, lexicon(lg)) for lg in non_english],
            list(ENGLISH_WORDS))


# ---------------------------------------------------------------------------
# Grammar pairs: reordering + morphology (round-4, VERDICT r3 #6)
#
# The cipher-gloss pairs below exercise only word-for-word substitution; a
# real language pair (reference gemini_pipeline.py:176-179,208) also demands
# REORDERING (SOV/VSO -> English SVO) and MORPHOLOGY (case/number/tense
# suffixes -> English function words and inflection). Each synthetic
# language gets a deterministic typology — word order, adjective position,
# case/plural/past suffixes in its own script, postpositions instead of
# prepositions, no articles — and the translator must parse structure, not
# substitute tokens: "lemma+ACC lemma+PL+NOM verb+PAST" (SOV) must become
# "the Xs verbed the Y".
# ---------------------------------------------------------------------------

_G_NOUNS = ("man woman child house water day night eye head hand side part "
            "place work year word world school road car city tree sea "
            "mother father family friend light horse story paper music "
            "river mountain country farm bird dog sun moon star table").split()
_G_VERBS = ("help follow watch open call turn ask need want play stay "
            "count cover cross walk look learn answer remember start "
            "stop talk listen carry reach pull plan wash miss").split()
_G_ADJS = ("big small old new good long high red white black green warm "
           "cold young short strong clear").split()
_G_PREPS = ("in", "on", "near", "with")


def _inflect_3sg(v: str) -> str:
    if v.endswith(("s", "x", "z", "ch", "sh")):
        return v + "es"
    if v.endswith("y") and v[-2:-1] not in "aeiou":
        return v[:-1] + "ies"
    return v + "s"


def _inflect_past(v: str) -> str:
    if v.endswith("e"):
        return v + "d"
    if v.endswith("y") and v[-2:-1] not in "aeiou":
        return v[:-1] + "ied"
    if v == "stop":
        return "stopped"
    if v == "plan":
        return "planned"
    return v + "ed"


def _inflect_plural(n: str) -> str:
    if n.endswith(("s", "x", "z", "ch", "sh")):
        return n + "es"
    if n.endswith("y") and n[-2:-1] not in "aeiou":
        return n[:-1] + "ies"
    if n == "man":
        return "men"
    if n == "woman":
        return "women"
    if n == "child":
        return "children"
    return n + "s"


def _typology(name: str, lex: List[str]):
    """Deterministic per-language grammar profile, affixes in the
    language's own script (drawn from its lexicon's character set)."""
    import hashlib

    seed = int.from_bytes(hashlib.md5(name.encode()).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    alphabet = sorted({c for w in lex[:200] for c in w})
    def syllable(n):
        return "".join(alphabet[int(rng.integers(len(alphabet)))]
                       for _ in range(n))
    # distinct affix forms (regenerate on collision)
    forms: List[str] = []
    while len(forms) < 8:
        f = syllable(int(rng.integers(1, 3)))
        if f not in forms:
            forms.append(f)
    return {
        "order": ("sov", "vso", "svo")[int(rng.integers(3))],
        "adj_post": bool(rng.integers(2)),
        "acc": forms[0], "obl": forms[1], "pl": forms[2], "past": forms[3],
        # postposition words for in/on/near/with
        "post": dict(zip(_G_PREPS, forms[4:8])),
    }


def _grammar_tables(tables, english):
    """Per-language grammar profiles + the content-word index map.

    Only words present in ENGLISH_WORDS participate (the cipher lexicons
    are index-aligned with it)."""
    idx = {w: i for i, w in enumerate(english)}
    nouns = [w for w in _G_NOUNS if w in idx]
    verbs = [w for w in _G_VERBS if w in idx]
    adjs = [w for w in _G_ADJS if w in idx]
    profiles = [(name, lex, _typology(name, lex))
                for name, lex in tables]
    return {"idx": idx, "nouns": nouns, "verbs": verbs, "adjs": adjs,
            "profiles": profiles}


def draw_grammar_pair(rng: np.random.Generator, g) -> Tuple[str, str]:
    """One (source, english) pair requiring reordering + morphology."""
    name, lex, ty = g["profiles"][int(rng.integers(len(g["profiles"])))]
    idx = g["idx"]

    def lemma(w: str) -> str:
        return lex[idx[w]]

    past = bool(rng.integers(2))
    subj = g["nouns"][int(rng.integers(len(g["nouns"])))]
    verb = g["verbs"][int(rng.integers(len(g["verbs"])))]
    subj_pl = rng.random() < 0.3
    adj = (g["adjs"][int(rng.integers(len(g["adjs"])))]
           if rng.random() < 0.4 else None)
    obj = obj_pl = pp = None
    if rng.random() < 0.75:
        obj = g["nouns"][int(rng.integers(len(g["nouns"])))]
        obj_pl = rng.random() < 0.3
    if rng.random() < 0.4:
        pp = (_G_PREPS[int(rng.integers(len(_G_PREPS)))],
              g["nouns"][int(rng.integers(len(g["nouns"])))])

    # --- source (no articles, affixing morphology, typology order) ---
    def src_np(noun, plural, case):
        w = lemma(noun) + (ty["pl"] if plural else "") + case
        if adj is not None and noun is subj:
            a = lemma(adj)
            return f"{w} {a}" if ty["adj_post"] else f"{a} {w}"
        return w

    s_np = src_np(subj, subj_pl, "")
    v_w = lemma(verb) + (ty["past"] if past else "")
    o_np = src_np(obj, obj_pl, ty["acc"]) if obj else None
    pp_w = (f"{lemma(pp[1])}{ty['obl']} {ty['post'][pp[0]]}"
            if pp else None)
    if ty["order"] == "sov":
        parts = [s_np, o_np, pp_w, v_w]
    elif ty["order"] == "vso":
        parts = [v_w, s_np, o_np, pp_w]
    else:
        parts = [s_np, v_w, o_np, pp_w]
    src = " ".join(p for p in parts if p)

    # --- English target (articles, inflection, SVO, prepositions) ---
    def en_np(noun, plural):
        head = _inflect_plural(noun) if plural else noun
        if adj is not None and noun is subj:
            return f"the {adj} {head}"
        return f"the {head}"

    if past:
        v_en = _inflect_past(verb)
    elif subj_pl:
        v_en = verb
    else:
        v_en = _inflect_3sg(verb)
    out = [en_np(subj, subj_pl), v_en]
    if obj:
        out.append(en_np(obj, obj_pl))
    if pp:
        out.append(f"{pp[0]} the {pp[1]}")
    return src, " ".join(out)


def draw_pair(rng: np.random.Generator, tables, english,
              lexicon_size: int, g=None, real=None) -> Tuple[str, str]:
    """One (source_text, english_gloss) pair.

    Mix mirrors translator_train.py: 1/6 two-language concatenations
    (code-switch segments), 1/2 uniform word draws (full lexicon coverage),
    the rest zipf-ish draws (the engine's natural segment distribution).
    With grammar tables ``g`` (round-4), 40% of draws are reordering/
    morphology clauses (draw_grammar_pair); with a ``real`` corpus
    (train/real_pairs.py), 20% are genuine natural-language pairs from the
    on-box gettext/CLDR resources."""
    if g is not None or real is not None:
        r0 = rng.random()
        if g is not None and r0 < 0.4:
            return draw_grammar_pair(rng, g)
        if real is not None and r0 < 0.6:
            from .real_pairs import draw_real_pair

            return draw_real_pair(rng, real)
    r = rng.random()

    def draw_one(max_words: int) -> Tuple[str, str]:
        _, lex = tables[int(rng.integers(len(tables)))]
        n_words = int(rng.integers(1, max_words + 1))
        if rng.random() < 0.6:
            idx = rng.integers(0, lexicon_size, n_words)
        else:
            idx = np.minimum((rng.pareto(1.2, n_words) * 12).astype(int),
                             lexicon_size - 1)
        src = " ".join(lex[i] for i in idx)
        tgt = " ".join(english[i] for i in idx)
        return src, tgt

    if r < 1 / 6:
        a_src, a_tgt = draw_one(5)
        b_src, b_tgt = draw_one(5)
        return f"{a_src} {b_src}", f"{a_tgt} {b_tgt}"
    return draw_one(10)


def ctc_noise(rng: np.random.Generator, text: str, *, p_sub: float = 0.03,
              p_del: float = 0.02, p_ins: float = 0.02,
              p_merge: float = 0.01) -> str:
    """CTC-style corruption of a transcript: per-char substitution /
    deletion / insertion from the string's own alphabet, plus occasional
    word merges (dropped spaces) — the error modes the byte CTC head
    actually produces."""
    alphabet = sorted({c for c in text if c != " "}) or ["a"]
    out: List[str] = []
    for c in text:
        r = rng.random()
        if c == " " and r < p_merge:
            continue
        if c != " ":
            if r < p_del:
                continue
            if r < p_del + p_sub:
                out.append(alphabet[int(rng.integers(len(alphabet)))])
                continue
        out.append(c)
        if rng.random() < p_ins:
            out.append(alphabet[int(rng.integers(len(alphabet)))])
    return "".join(out)


def encode_pair(src: str, tgt: str, vocab):
    """-> (src_ids, src_mask, dec_inp, dec_tgt, dec_mask)."""
    sb = src.encode("utf-8")[:MAX_SOURCE_LEN]
    src_ids = np.zeros(MAX_SOURCE_LEN, np.int32)
    src_mask = np.zeros(MAX_SOURCE_LEN, bool)
    for i, b in enumerate(sb):
        src_ids[i] = vocab.byte_to_id(b)
        src_mask[i] = True
    tb = tgt.encode("utf-8")[:MAX_TGT_BYTES - 1]
    ids = [vocab.byte_to_id(b) for b in tb]
    inp = np.zeros(MAX_TGT_BYTES, np.int32)
    out = np.zeros(MAX_TGT_BYTES, np.int32)
    msk = np.zeros(MAX_TGT_BYTES, bool)
    inp[1:1 + len(ids)] = ids
    out[:len(ids)] = ids
    msk[:len(ids) + 1] = True  # include EOS position
    return src_ids, src_mask, inp, out, msk


def make_batch(rng: np.random.Generator, tables, english, lexicon_size: int,
               vocab, batch_size: int, *, noise: bool, g=None, real=None):
    rows = []
    for _ in range(batch_size):
        src, tgt = draw_pair(rng, tables, english, lexicon_size, g, real)
        if noise and rng.random() < 0.7:  # 30% of batches stay clean
            src = ctc_noise(rng, src)
        rows.append(encode_pair(src, tgt, vocab))
    return tuple(jnp.asarray(np.stack(c)) for c in zip(*rows))


def word_accuracy(hyp: str, ref: str) -> Tuple[int, int]:
    h, r = hyp.split(), ref.split()
    return sum(1 for a, b in zip(h, r) if a == b), len(r)


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def train_translator(out_dir: str, *, steps: int = 4000,
                     batch_size: int = 128, lr: float = 1e-3,
                     n_eval: int = 256, seed: int = 0,
                     eval_every: int = 500, log_every: int = 100,
                     cfg: Optional[PipelineConfig] = None,
                     metrics_log: Optional[str] = None,
                     tiny: bool = False):
    cfg = cfg or (tiny_config() if tiny else PipelineConfig.from_env())
    vocab = cfg.vocab
    from .synth import LEXICON_SIZE

    tables, english = _lang_tables()
    gtables = _grammar_tables(tables, english)
    try:
        from .real_pairs import build_real_corpus, draw_real_pair

        real = build_real_corpus()
        if not real["n_train"]:
            real = None
    except ImportError:  # humanize/babel absent on this box
        real = None
    rng = np.random.default_rng(seed)

    # Fixed held-out sets, excluded from training draws by seed separation
    # (draws are continuous random text — collisions are immaterial because
    # the training stream never repeats, so there is nothing to leak).
    ev_rng = np.random.default_rng(seed + 10_000)
    ev_pairs = [draw_pair(ev_rng, tables, english, LEXICON_SIZE, gtables)
                for _ in range(n_eval)]
    ev_noisy = [(ctc_noise(ev_rng, s), t) for s, t in ev_pairs]
    # reordering/morphology-only subset (VERDICT r3 #6 gate)
    ev_gram = [draw_grammar_pair(ev_rng, gtables) for _ in range(n_eval)]
    # real-language subset: HELD-OUT pairs (hash-split in real_pairs.py,
    # never drawn in training) — generalization to unseen real vocabulary
    ev_real = ([draw_real_pair(ev_rng, real, "heldout")
                for _ in range(n_eval)] if real else [])

    def encode_eval(pairs):
        rows = [encode_pair(s, t, vocab) for s, t in pairs]
        cols = tuple(jnp.asarray(np.stack(c)) for c in zip(*rows))
        return cols[0], cols[1]

    ev_clean_ids = encode_eval(ev_pairs)
    ev_noisy_ids = encode_eval(ev_noisy)
    ev_gram_ids = encode_eval(ev_gram)
    ev_real_ids = encode_eval(ev_real) if ev_real else None

    params = text_translator_init(jax.random.PRNGKey(seed), cfg, n_layers=4)
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.zero_nans(),
        optax.adamw(optax.warmup_cosine_decay_schedule(
            0.0, lr, min(200, max(1, steps // 5)), steps, lr * 0.05),
            weight_decay=1e-6))
    opt_state = opt.init(params)

    def loss_fn(p, src_ids, src_mask, inp, tgt, msk):
        mem = encode_source(p, src_ids, src_mask, cfg)
        logits = decoder_forward(p, inp, mem, src_mask, cfg)
        logp = jax.nn.log_softmax(logits, axis=-1)
        pick = jnp.take_along_axis(logp, tgt[:, :, None], axis=-1)[:, :, 0]
        m = msk.astype(jnp.float32)
        return -(pick * m).sum() / jnp.maximum(m.sum(), 1.0)

    @jax.jit
    def step(p, s, src_ids, src_mask, inp, tgt, msk):
        loss, g = jax.value_and_grad(loss_fn)(p, src_ids, src_mask,
                                              inp, tgt, msk)
        upd, s = opt.update(g, s, p)
        return optax.apply_updates(p, upd), s, loss

    def eval_acc(p, ids_mask, refs) -> float:
        ids, mask = ids_mask
        ok = words = 0
        B = 64
        for b0 in range(0, ids.shape[0], B):
            toks = np.asarray(translate_text(
                p, ids[b0:b0 + B], mask[b0:b0 + B], cfg,
                max_len=MAX_TGT_BYTES))
            for j in range(toks.shape[0]):
                hyp = tokens_to_text(toks[j], vocab)
                a, b = word_accuracy(hyp, refs[b0 + j][1])
                ok += a
                words += b
        return ok / max(words, 1)

    metrics_path = Path(metrics_log) if metrics_log else None
    if metrics_path:
        metrics_path.parent.mkdir(parents=True, exist_ok=True)

    def emit(line: dict):
        print(json.dumps(line), flush=True)
        if metrics_path:
            with metrics_path.open("a") as f:
                f.write(json.dumps(line) + "\n")

    best_acc, best_params = -1.0, params
    t0 = time.perf_counter()
    for i in range(steps):
        batch = make_batch(rng, tables, english, LEXICON_SIZE, vocab,
                           batch_size, noise=True, g=gtables, real=real)
        params, opt_state, loss = step(params, opt_state, *batch)
        if (i + 1) % log_every == 0 or i + 1 == steps:
            emit({"step": i + 1, "ce": round(float(loss), 4),
                  "steps_per_s": round((i + 1) /
                                       (time.perf_counter() - t0), 2)})
        if (i + 1) % eval_every == 0 or i + 1 == steps:
            acc_c = eval_acc(params, ev_clean_ids, ev_pairs)
            acc_n = eval_acc(params, ev_noisy_ids, ev_noisy)
            acc_g = eval_acc(params, ev_gram_ids, ev_gram)
            ev = {"translation_word_acc": round(acc_c, 4),
                  "translation_word_acc_noisy": round(acc_n, 4),
                  "translation_word_acc_grammar": round(acc_g, 4),
                  "n_eval": n_eval}
            if ev_real_ids is not None:
                ev["translation_word_acc_real_heldout"] = round(
                    eval_acc(params, ev_real_ids, ev_real), 4)
                ev["real_corpus"] = {"n_train": real["n_train"],
                                     "n_heldout": real["n_heldout"],
                                     "n_languages": len(real["languages"])}
            emit({"step": i + 1, "eval": ev})
            if acc_c > best_acc:
                best_acc, best_params = acc_c, jax.device_get(params)

    report = {"eval": {"translation_word_acc": round(best_acc, 4),
                       "n_eval": n_eval, "mode": "text"}}
    emit(report)
    out = Path(out_dir)
    # Orbax REPLACES the target directory on save; if the metrics log lives
    # inside it (as the round-5 queue arranged), the save would silently
    # destroy the run's whole eval history — and with it the queue's ship
    # gate input. Stash and restore it around the save.
    stash = None
    if metrics_path is not None:
        try:
            if metrics_path.resolve().is_relative_to(out.resolve()):
                stash = metrics_path.read_bytes()
        except (OSError, ValueError):
            stash = None
    save_translator(out, best_params)
    if stash is not None:
        metrics_path.write_bytes(stash)
    print(f"saved text translator -> {out}", flush=True)
    return best_params, best_acc


def main() -> None:
    from ..utils.term import install_sigterm_exit

    install_sigterm_exit()
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n-eval", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--metrics-log", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (CI mechanics)")
    a = ap.parse_args()
    train_translator(a.out, steps=a.steps, batch_size=a.batch_size,
                     lr=a.lr, n_eval=a.n_eval, seed=a.seed,
                     eval_every=a.eval_every, metrics_log=a.metrics_log,
                     tiny=a.tiny)


if __name__ == "__main__":
    main()
