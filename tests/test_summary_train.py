"""Summarizer-trainer building blocks (train/summary_train.py)."""

import numpy as np

from omnilingual_asr_tpu.config import tiny_config
from omnilingual_asr_tpu.train.summary_train import (
    build_utterance_pool,
    encode_summary,
    facts_score,
    make_conversation,
    summary_text,
)


class TestSummaryTargets:
    def test_encode_summary_roundtrip(self):
        cfg = tiny_config()
        text = "A conversation between 3 speakers in Greek."
        inp, tgt, msk = encode_summary(text, cfg.vocab)
        # teacher forcing: inp is BOS + bytes, tgt is bytes + EOS
        assert inp[0] == 0
        n = len(text.encode())
        assert msk[:n + 1].all() and not msk[n + 1:].any()
        back = bytes(cfg.vocab.id_to_byte(t) for t in tgt[:n]).decode()
        assert back == text
        np.testing.assert_array_equal(inp[1:n + 1], tgt[:n])
        assert tgt[n] == 0  # EOS

    def test_facts_score(self):
        facts = {"n_speakers": 2, "languages": ["Greek"], "tone": "happy"}
        s = facts_score(
            "A conversation between 2 speakers in Greek. "
            "Overall tone: happy.", facts)
        assert s["all"] == 1.0
        s = facts_score("One speaker in Greek. Overall tone: sad.", facts)
        assert s["speakers"] == 0.0 and s["tone"] == 0.0

    def test_single_speaker_templates(self):
        rng = np.random.default_rng(0)
        t = summary_text(rng, {"n_speakers": 1, "languages": ["Thai"],
                               "tone": "neutral"})
        assert "speakers" not in t
        assert "Thai" in t and "neutral" in t


class TestConversationFacts:
    def test_facts_match_construction(self):
        rng = np.random.default_rng(1)
        pool = build_utterance_pool(rng, 32)
        samples, facts = make_conversation(rng, pool)
        assert samples.dtype == np.float32
        assert len(samples) > 16000  # at least a second
        assert 1 <= facts["n_speakers"] <= 4
        assert 1 <= len(facts["languages"]) <= 2
        pool_langs = {u["language"] for u in pool}
        assert set(facts["languages"]) <= pool_langs
        assert np.abs(samples).max() <= 1.0
