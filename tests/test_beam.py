"""CTC prefix beam search vs exhaustive enumeration."""

import numpy as np
import pytest

from omnilingual_asr_tpu.ops.beam import (
    ctc_prefix_beam_search,
    exhaustive_ctc_best,
)


def log_softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


class TestPrefixBeam:
    @pytest.mark.parametrize("seed", range(5))
    def test_matches_exhaustive(self, seed):
        rng = np.random.default_rng(seed)
        T, V = 5, 4
        logp = log_softmax(rng.standard_normal((T, V)) * 2)
        # beam wide enough to keep every prefix -> exact
        beams = ctc_prefix_beam_search(logp, beam_size=1024, topk=V)
        want_seq, want_score = exhaustive_ctc_best(logp)
        assert beams[0].prefix == want_seq, (beams[0], want_seq)
        np.testing.assert_allclose(beams[0].score, want_score, rtol=1e-6)
        # pruned beam still finds the same best sequence here
        pruned = ctc_prefix_beam_search(logp, beam_size=8, topk=V)
        assert pruned[0].prefix == want_seq

    def test_beats_or_matches_greedy(self):
        """Prefix search sums over alignments, so its best hypothesis's
        probability >= the greedy path's sequence probability."""
        rng = np.random.default_rng(42)
        T, V = 12, 6
        logp = log_softmax(rng.standard_normal((T, V)) * 1.5)
        beams = ctc_prefix_beam_search(logp, beam_size=8, topk=V)
        # greedy collapse
        ids = logp.argmax(-1)
        prev, greedy = -1, []
        for c in ids:
            if c != prev and c != 0:
                greedy.append(int(c))
            prev = c
        greedy_path_score = float(logp.max(-1).sum())
        assert beams[0].score >= greedy_path_score - 1e-9

    def test_blank_dominant_gives_empty(self):
        logp = np.full((6, 4), -10.0)
        logp[:, 0] = -0.01
        beams = ctc_prefix_beam_search(log_softmax(logp), beam_size=4)
        assert beams[0].prefix == ()

    def test_repeat_needs_blank(self):
        """'aa' requires a blank between emissions; a run of the same class
        collapses to one."""
        logp = np.full((3, 3), -20.0)
        logp[:, 1] = -0.001  # class 1 dominant all 3 frames
        beams = ctc_prefix_beam_search(log_softmax(logp), beam_size=4)
        assert beams[0].prefix == (1,)

    def test_long_input_fast(self):
        rng = np.random.default_rng(0)
        logp = log_softmax(rng.standard_normal((750, 257)))
        import time

        t0 = time.perf_counter()
        beams = ctc_prefix_beam_search(logp, beam_size=8, topk=8)
        dt = time.perf_counter() - t0
        assert beams
        assert dt < 5.0, f"beam search too slow: {dt:.2f}s"

# ---------------------------------------------------------------------------
# Lexicon-LM shallow fusion (ops/lexicon.py)
# ---------------------------------------------------------------------------

from omnilingual_asr_tpu.ops.lexicon import TrieLM, synth_lexicon


def byte_ids(s: str):
    """vocab mapping: byte value b -> class id b + 1 (config VocabConfig)."""
    return tuple(b + 1 for b in s.encode("utf-8"))


class TestTrieLM:
    def test_in_lexicon_word_scores_word_logp(self):
        lm = TrieLM([("cat", -1.0), ("cab", -2.0)])
        st = lm.start()
        total = 0.0
        for b in b"cat":
            st, d = lm.advance(st, b)
            total += d
        n, d = lm.finalize(st)
        assert n == 1
        np.testing.assert_allclose(total + d, -1.0)

    def test_oov_word_charged_per_byte(self):
        lm = TrieLM([("cat", -1.0)], oov_byte_logp=-4.0)
        st = lm.start()
        total = 0.0
        for b in b"dog":
            st, d = lm.advance(st, b)
            total += d
        n, d = lm.finalize(st)
        assert n == 1
        np.testing.assert_allclose(total + d, -12.0)  # 3 bytes * -4

    def test_derail_cost_independent_of_derail_point(self):
        """'cax' (derails at byte 3) and 'xca' (derails at byte 1) cost the
        same: oov_byte_logp * len."""
        lm = TrieLM([("cat", -1.0)], oov_byte_logp=-4.0)
        costs = []
        for w in (b"cax", b"xca"):
            st, total = lm.start(), 0.0
            for b in w:
                st, d = lm.advance(st, b)
                total += d
            _, d = lm.finalize(st)
            costs.append(total + d)
        np.testing.assert_allclose(costs[0], costs[1])
        np.testing.assert_allclose(costs[0], -12.0)

    def test_boundary_completes_and_counts_words(self):
        lm = TrieLM([("a", -0.5), ("b", -0.7)])
        st, total = lm.start(), 0.0
        for b in b"a b":
            st, d = lm.advance(st, b)
            total += d
        n, d = lm.finalize(st)
        assert n == 2
        np.testing.assert_allclose(total + d, -1.2)

    def test_case_folding(self):
        lm = TrieLM([("four", -1.0)])
        st, total = lm.start(), 0.0
        for b in b"Four":
            st, d = lm.advance(st, b)
            total += d
        _, d = lm.finalize(st)
        np.testing.assert_allclose(total + d, -1.0)

    def test_synth_lexicon_builds(self):
        lm = synth_lexicon()
        # 'the' is ENGLISH_WORDS[0]
        st, total = lm.start(), 0.0
        for b in b"the":
            st, d = lm.advance(st, b)
            total += d
        _, d = lm.finalize(st)
        assert total + d > -5.0  # frequent word, cheap


class TestBeamLMFusion:
    def _ambiguous_logp(self, good: str, bad: str):
        """Frame scores marginally preferring the OOV spelling."""
        gb, bb = byte_ids(good), byte_ids(bad)
        assert len(gb) == len(bb)
        T = len(gb)
        logp = np.full((T, 258), -18.0, np.float32)
        for t, (g, b) in enumerate(zip(gb, bb)):
            if g == b:
                logp[t, g] = -0.01
            else:
                logp[t, b] = -0.6   # acoustics slightly prefer the bad one
                logp[t, g] = -0.8
        return log_softmax(logp)

    def test_lm_fixes_spelling(self):
        lm = TrieLM([("four", -1.0)], oov_byte_logp=-4.0)
        logp = self._ambiguous_logp("four", "fogr")
        base = ctc_prefix_beam_search(logp, beam_size=8, topk=6)
        fused = ctc_prefix_beam_search(logp, beam_size=8, topk=6,
                                       lm=lm, lm_alpha=0.5, word_bonus=0.5)
        assert base[0].prefix == byte_ids("fogr")
        assert fused[0].prefix == byte_ids("four")

    def test_alpha_zero_is_noop(self):
        rng = np.random.default_rng(3)
        logp = log_softmax(rng.standard_normal((20, 40)) * 2)
        lm = TrieLM([("ab", -1.0)])
        a = ctc_prefix_beam_search(logp, beam_size=8, topk=8)
        b = ctc_prefix_beam_search(logp, beam_size=8, topk=8,
                                   lm=lm, lm_alpha=0.0, word_bonus=9.0)
        assert [h.prefix for h in a] == [h.prefix for h in b]
        np.testing.assert_allclose([h.score for h in a],
                                   [h.score for h in b])

    def test_oov_stays_reachable(self):
        """Soft constraint: with clear acoustics an OOV word wins anyway."""
        lm = TrieLM([("four", -1.0)], oov_byte_logp=-4.0)
        gb = byte_ids("zqk")
        logp = np.full((3, 258), -25.0, np.float32)
        for t, g in enumerate(gb):
            logp[t, g] = -0.001
        fused = ctc_prefix_beam_search(log_softmax(logp), beam_size=8,
                                       topk=4, lm=lm, lm_alpha=0.5,
                                       word_bonus=0.5)
        assert fused[0].prefix == gb


class TestEngineLMBuilder:
    """_decode_lm is pure over (config, cache slot) — test without paying
    for engine construction."""

    def _call(self, decode):
        from types import SimpleNamespace

        from omnilingual_asr_tpu.engine import TranscriptionEngine

        fake = SimpleNamespace(config=SimpleNamespace(decode=decode))
        return TranscriptionEngine._decode_lm(fake)

    def test_alpha_zero_disables(self):
        from dataclasses import replace

        from omnilingual_asr_tpu.config import DecodeConfig

        assert self._call(replace(DecodeConfig(), lm_alpha=0.0)) is None
        assert self._call(replace(DecodeConfig(), lexicon=None)) is None

    def test_wordlist_path(self, tmp_path):
        from dataclasses import replace

        from omnilingual_asr_tpu.config import DecodeConfig

        wl = tmp_path / "words.txt"
        wl.write_text("four score seven\nyears\n")
        lm = self._call(replace(DecodeConfig(), lm_alpha=0.5,
                                lexicon=str(wl)))
        st, total = lm.start(), 0.0
        for b in b"score":
            st, d = lm.advance(st, b)
            total += d
        _, d = lm.finalize(st)
        assert total + d == -np.log(4)


class TestEngineBeamText:
    """_beam_text over engine-shaped top-K arrays (the exact dense
    reconstruction + byte mapping + LM plumbing the product uses)."""

    def _beam_text(self, topk, f0, f1, alpha):
        from dataclasses import replace
        from types import SimpleNamespace

        from omnilingual_asr_tpu.config import tiny_config
        from omnilingual_asr_tpu.engine import TranscriptionEngine
        from omnilingual_asr_tpu.ops.lexicon import TrieLM

        cfg = tiny_config()
        cfg = replace(cfg, decode=replace(cfg.decode, beam_size=8,
                                          lm_alpha=alpha,
                                          lm_word_bonus=0.5))
        fake = SimpleNamespace(config=cfg,
                               _lexicon_lm=TrieLM([("four", -1.0)]))
        fake._decode_lm = lambda: TranscriptionEngine._decode_lm(fake)
        return TranscriptionEngine._beam_text(fake, topk, f0, f1)

    def _topk_for(self, good: str, bad: str, k=4):
        """Engine-shaped (logp, ids) [T, k]: acoustics slightly prefer
        the OOV spelling, with blanks interleaved."""
        gb, bb = byte_ids(good), byte_ids(bad)
        T = 2 * len(gb)
        lp = np.full((T, k), -14.0, np.float32)
        ids = np.zeros((T, k), np.int64)
        for t in range(T):
            if t % 2 == 1:
                lp[t, 0], ids[t, 0] = -0.01, 0        # blank frame
                ids[t, 1:] = np.arange(1, k)
                continue
            i = t // 2
            ids[t, 0], lp[t, 0] = bb[i], -0.5
            ids[t, 1], lp[t, 1] = gb[i], -0.9
            ids[t, 2], lp[t, 2] = 0, -3.0             # blank in top-k
            ids[t, 3] = 200
        return lp, ids

    def test_lm_fixes_spelling_through_engine_path(self):
        topk = self._topk_for("four", "fogr")
        T = topk[0].shape[0]
        assert self._beam_text(topk, 0, T, alpha=0.0) == "fogr"
        assert self._beam_text(topk, 0, T, alpha=0.6) == "four"


class TestBigramLM:
    def _lm(self):
        from omnilingual_asr_tpu.ops.lexicon import synth_lexicon

        return synth_lexicon(bigram=True)

    @staticmethod
    def _score(lm, text: str) -> float:
        st = lm.start()
        total = 0.0
        for b in text.encode("utf-8"):
            st, d = lm.advance(st, b)
            total += d
        _, d = lm.finalize(st)
        return total + d

    def test_state_word_count_index(self):
        """ops/beam.py reads n_words at state index 2 — keep it there."""
        lm = self._lm()
        st = lm.start()
        for b in b"the old man":
            st, _ = lm.advance(st, b)
        n_words, _ = lm.finalize(st)
        assert st[2] == 2           # two completed words mid-state
        assert n_words == 3

    def test_bank_order_beats_scrambled(self):
        """Observed word order from the sentence bank should outscore the
        same words scrambled (what a bag-of-words unigram cannot do)."""
        lm = self._lm()
        assert (self._score(lm, "the old man walked")
                > self._score(lm, "walked man old the"))

    def test_unseen_context_matches_unigram(self):
        """Cipher-language decoding must be bit-identical to the unigram
        trie (no sentence-bank context exists for those words)."""
        from omnilingual_asr_tpu.ops.lexicon import synth_lexicon
        from omnilingual_asr_tpu.train.synth import LANGUAGES, lexicon

        uni = synth_lexicon()
        big = self._lm()
        words = lexicon(LANGUAGES[2])[:5]    # Russian cipher words
        text = " ".join(words)
        assert abs(self._score(big, text)
                   - TestBigramLM._score(uni, text)) < 1e-9

    def test_beam_search_accepts_bigram_lm(self):
        import numpy as np

        from omnilingual_asr_tpu.ops.beam import ctc_prefix_beam_search

        lm = self._lm()
        rng = np.random.default_rng(0)
        logp = rng.normal(-3, 1, size=(6, 12)).astype(np.float32)
        beams = ctc_prefix_beam_search(logp, beam_size=4, blank_id=0,
                                       lm=lm, lm_alpha=0.3)
        assert beams and isinstance(beams[0].prefix, tuple)

    def test_engine_decode_lm_bigram_factory(self):
        """lexicon='synth_bigram' builds a BigramTrieLM through the real
        engine factory and decodes through _beam_text."""
        from dataclasses import replace
        from types import SimpleNamespace

        from omnilingual_asr_tpu.config import tiny_config
        from omnilingual_asr_tpu.engine import TranscriptionEngine
        from omnilingual_asr_tpu.ops.lexicon import BigramTrieLM

        cfg = tiny_config()
        cfg = replace(cfg, decode=replace(cfg.decode, beam_size=4,
                                          lm_alpha=0.3,
                                          lexicon="synth_bigram"))
        fake = SimpleNamespace(config=cfg)
        fake._decode_lm = lambda: TranscriptionEngine._decode_lm(fake)
        lm = fake._decode_lm()
        assert isinstance(lm, BigramTrieLM)
        lp = np.full((4, 3), -2.0, np.float32)
        ids = np.tile(np.array([0, 1, 2]), (4, 1))
        out = TranscriptionEngine._beam_text(fake, (lp, ids), 0, 4)
        assert out is not None
