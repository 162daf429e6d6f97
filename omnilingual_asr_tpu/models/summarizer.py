"""Audio summarization.

Replaces prompt requirement #7 of the reference (a brief summary including
speaker count and overall tone, reference gemini_pipeline.py:210, schema
:126-129). Two tiers:

1. ``template_summary`` — deterministic metadata summary (speaker count,
   segment count, languages, duration, dominant tone). Always available;
   this is what the engine emits today and it satisfies the schema contract
   exactly (the reference frontend only *displays* the summary text and
   strips appended metadata lines, public/static/app.js:617-620).

2. ``SummaryDecoder`` — a neural summarizer: the translation decoder
   architecture cross-attending to a downsampled view of the whole file's
   encoder states (window-mean pooling keeps the memory bounded for 9.5 h
   inputs). Architecture is in place and unit-tested; it activates once
   trained weights exist (same checkpoint machinery as the ASR model).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from .translation import greedy_translate, tokens_to_text, translator_init


def template_summary(*, duration_s: float, n_speakers: int, n_segments: int,
                     language_names: List[str], top_emotion: str) -> str:
    """Deterministic summary with the schema-required facts."""
    langs = ", ".join(language_names[:4])
    return (
        f"Audio of {duration_s:.1f} seconds with {n_speakers} "
        f"speaker{'s' if n_speakers != 1 else ''} across "
        f"{n_segments} segments"
        + (f" in {langs}" if langs else "")
        + f". Overall tone: {top_emotion}."
    )


class SummaryDecoder:
    """Neural summary head over pooled encoder states."""

    def __init__(self, cfg: PipelineConfig, params=None, *,
                 n_layers: int = 2, pool_windows: int = 128,
                 seed: int = 7):
        self.cfg = cfg
        self.pool_windows = pool_windows
        self.params = params if params is not None else translator_init(
            jax.random.PRNGKey(seed), cfg, n_layers=n_layers)

    def pool_states(self, window_states: List[np.ndarray]) -> np.ndarray:
        """Mean-pool each window's encoder frames to one vector and pad to
        ``pool_windows`` slots: [pool_windows, D] memory for the decoder.
        (9.5 h = 1140 windows of 30 s; windows are further averaged in
        groups to fit the slot budget.)"""
        D = self.cfg.encoder.d_model
        if not window_states:
            return np.zeros((self.pool_windows, D), np.float32)
        means = np.stack([w.mean(axis=0) for w in window_states])
        n = len(means)
        if n > self.pool_windows:
            groups = np.array_split(means, self.pool_windows)
            means = np.stack([g.mean(axis=0) for g in groups])
            n = self.pool_windows
        out = np.zeros((self.pool_windows, D), np.float32)
        out[:n] = means
        return out

    @property
    def fact_conditioned(self) -> bool:
        """True when the checkpoint was trained with a forced fact prefix
        (marker leaf written by train/summary_train.py --facts)."""
        return isinstance(self.params, dict) and "fact_cond" in self.params

    def summarize(self, window_states: List[np.ndarray],
                  max_len: int = 192,
                  facts: Optional[dict] = None) -> Optional[str]:
        """Greedy-decode a summary from pooled states; None when the decode
        produces nothing useful (callers fall back to template_summary).

        For a fact-conditioned checkpoint, ``facts`` (n_speakers, tone,
        language_names — the engine's OWN head outputs) are force-decoded
        as a prefix: the continuation READS the facts instead of estimating
        them from mean-pooled states, which provably smear speaker identity
        (round-3 measured: speaker-count fact accuracy 0.40 unconditioned).
        The prefix is stripped from the returned text."""
        pooled = self.pool_states(window_states)
        n_valid = sum(1 for _ in window_states) or 1
        enc = jnp.asarray(pooled)[None]
        mask = jnp.asarray(
            np.arange(self.pool_windows) < min(n_valid, self.pool_windows)
        )[None]
        forced = None
        n_prefix = 0
        if facts is not None and self.fact_conditioned:
            prefix_ids = fact_prefix_ids(self.cfg.vocab, **facts)[:max_len]
            n_prefix = len(prefix_ids)
            f = np.full((1, max_len), -1, np.int32)
            f[0, :n_prefix] = prefix_ids
            forced = jnp.asarray(f)
        toks = np.asarray(greedy_translate(
            self.params, enc, mask, self.cfg, max_len=max_len,
            n_heads=self.cfg.encoder.n_heads, forced=forced))
        text = tokens_to_text(toks[0, n_prefix:], self.cfg.vocab).strip()
        if not text or _degenerate(text):
            return None
        return text


def fact_prefix(*, n_speakers: int, tone: str,
                language_names: List[str]) -> str:
    """Serialized engine facts forced as the decode prefix. One canonical
    format shared by training (train/summary_train.py) and serving —
    any drift between the two desynchronizes the conditioning."""
    langs = ", ".join(language_names[:4])
    return f"[{n_speakers} | {tone} | {langs}] "


def fact_prefix_ids(vocab, *, n_speakers: int, tone: str,
                    language_names: List[str]) -> List[int]:
    s = fact_prefix(n_speakers=n_speakers, tone=tone,
                    language_names=language_names)
    return [vocab.byte_to_id(b) for b in s.encode("utf-8")]


def _degenerate(text: str) -> bool:
    """True for decode collapse: digit soup, non-letter noise, or a token
    repeated in a run (out-of-distribution audio makes the decoder emit
    strings like "2 speakers talk in 222 2 2222" — observed on real
    speech; such output must never replace the fact-grounded template)."""
    letters = sum(c.isalpha() or c.isspace() for c in text)
    if letters / max(len(text), 1) < 0.8:
        return True
    toks = text.lower().split()
    for a, b, c in zip(toks, toks[1:], toks[2:]):
        if a == b == c:
            return True
    return False


_COUNT_WORDS = {1: ("one", "single", "1"), 2: ("two", "2"),
                3: ("three", "3"), 4: ("four", "4"), 5: ("five", "5")}


def summary_consistent(text: str, *, n_speakers: int, tone: str) -> bool:
    """Does a generated summary agree with the engine's OWN metadata?

    The neural summarizer is trained to state checkable facts (speaker
    count + overall tone, reference prompt requirement #7,
    gemini_pipeline.py:210). The engine computes those same facts from its
    diarization and emotion heads — when the generated text contradicts
    them, the fact-grounded template is strictly more trustworthy, so the
    caller falls back (same honesty contract as translation gating)."""
    from ..types import EMOTIONS

    s = text.lower()
    mentioned = {e for e in EMOTIONS if e in s}
    if mentioned != {tone}:
        return False
    if n_speakers > 0:
        words = _COUNT_WORDS.get(n_speakers, (str(n_speakers),))
        if not any(w in s for w in words):
            return False
        # Claiming a DIFFERENT count than the diarizer's is a contradiction
        # (digit claims only — spelled-out numbers overlap too freely).
        import re

        for d in re.findall(r"\b(\d+)\b", s):
            if int(d) != n_speakers:
                return False
    return True
