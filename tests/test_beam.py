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
