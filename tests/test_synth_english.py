"""Phonetically-grounded English synthesis (train/synth_english.py).

The English branch of the synthetic corpus renders rule-based G2P phonemes
(formant targets + coarticulated transitions) instead of per-character
cipher units, so the scarce real English windows (train/synth.py
real_corpus — reference gettysburg.wav + gettysburg.eaf goldens) share an
acoustic-phonetic space with unlimited synthetic data. These tests pin the
G2P/synthesis contracts the trainer depends on."""

import numpy as np
import pytest

from omnilingual_asr_tpu.train.synth import (
    ENGLISH_WORDS,
    make_example,
    LANGUAGES,
    synth_utterance,
)
from omnilingual_asr_tpu.train.synth_english import (
    ALL_PHONES,
    g2p,
    g2p_word,
    synth_utterance_en,
)

EN = [lang for lang in LANGUAGES if lang.is_english]


def test_g2p_total_over_lexicon():
    """Every lexicon word produces >=1 phone and chunks covering every
    character in order (frame-CE labels need total char coverage)."""
    for w in ENGLISH_WORDS:
        chunks = g2p_word(w)
        phones = [p for ph, _, _ in chunks for p in ph]
        assert phones, w
        assert chunks[0][1] == 0 and chunks[-1][2] == len(w), w
        for a, b in zip(chunks, chunks[1:]):
            assert a[2] == b[1], (w, a, b)   # contiguous
        for p in phones:
            assert p in ALL_PHONES, (w, p)


def test_g2p_known_words():
    cases = {
        "the": ["DH", "AH"],
        "night": ["N", "AY", "T"],
        "nation": ["N", "EY", "SH", "AH", "N"],
        "make": ["M", "EY", "K"],     # magic-e
        "city": ["S", "IH", "T", "IY"],   # soft c
    }
    for w, want in cases.items():
        got = [p for ph, _, _ in g2p_word(w) for p in ph]
        assert got == want, (w, got, want)


def test_g2p_deterministic():
    a = g2p("four score and seven years ago")
    b = g2p("four score and seven years ago")
    assert a == b


def test_spans_total_monotonic():
    text = "four score and seven years ago"
    spans = []
    x = synth_utterance(text, 5, seed=11, english=True, word_spans=spans)
    assert len(spans) == len(text)
    prev_start = 0
    for s0, s1 in spans:
        assert 0 <= s0 <= s1 <= len(x)
        assert s0 >= prev_start
        prev_start = s0


def test_ctc_feasibility_floor():
    """Words with far fewer phones than letters still emit >=1.2 encoder
    frames per byte even at the fastest speed perturbation (rate 1.32),
    keeping CTC alignment feasible (subsample 4, hop 160)."""
    for w in ("through", "eight", "straight", "knight", "thought"):
        x = synth_utterance(w, 1, seed=3, rate=1.32, english=True)
        frames = len(x) / 640.0
        assert frames / len(w) > 1.2, (w, frames / len(w))


def test_english_examples_flow_through_make_example():
    rng = np.random.default_rng(0)
    for _ in range(4):
        ex = make_example(rng, languages=EN)
        assert len(ex.char_spans) == len(ex.text)
        assert ex.translation is None           # English: no gloss
        assert len(ex.samples) > 16
        assert np.isfinite(ex.samples).all()
        assert np.abs(ex.samples).max() <= 1.0


def test_synthesis_deterministic_per_seed():
    spk_args = dict(seed=7, english=True)
    a = synth_utterance("liberty and union", 9, **spk_args)
    b = synth_utterance("liberty and union", 9, **spk_args)
    np.testing.assert_array_equal(a, b)


def test_voiced_vowels_have_harmonic_structure():
    """A long vowel segment should concentrate energy near the speaker's
    f0 harmonics (i.e. actually be voiced, not noise)."""
    x = synth_utterance("aaa", 2, seed=5, english=True)
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    freqs = np.fft.rfftfreq(len(x), 1 / 16000)
    # voiced energy below 4 kHz should dominate energy above 6 kHz
    low = spec[(freqs > 100) & (freqs < 4000)].sum()
    high = spec[freqs > 6000].sum()
    assert low > 5 * high


# -- v2: lexical stress, vowel reduction, matched voice ----------------------


def test_stress_one_nucleus_per_content_word():
    from omnilingual_asr_tpu.train.synth_english import _phone_plan
    plan = _phone_plan("the great nation", 1.0)
    stressed = [(p[0], p[2], p[3]) for p in plan if p[4]]
    # exactly one stressed nucleus per content word; "the" unstressed
    assert len(stressed) == 2
    assert all(ph == "EY" for ph, _, _ in stressed)


def test_second_stress_words():
    from omnilingual_asr_tpu.train.synth_english import _phone_plan
    plan = _phone_plan("again", 1.0)
    stressed = [p[0] for p in plan if p[4]]
    assert stressed == ["EH"]          # a-GAIN


def test_unstressed_vowel_is_shorter():
    from omnilingual_asr_tpu.train.synth_english import _phone_plan
    # same vowel EY: stressed in "great", reduced schedule in "nation"'s AH
    plan = _phone_plan("great nation", 1.0)
    by = {(p[0], p[4]): p[1] for p in plan}
    assert by[("EY", 1)] > by[("AH", 0)]


def test_matched_voice_draws_label_speaker_zero():
    from omnilingual_asr_tpu.train.synth import LANGUAGES, make_example
    rng = np.random.default_rng(3)
    ex = make_example(rng, voice_match_p=1.0, languages=[LANGUAGES[0]])
    assert ex.voice_matched
    assert ex.speaker_id == 0
    assert np.isfinite(ex.samples).all()
    # non-English languages never voice-match
    ex2 = make_example(rng, voice_match_p=1.0, languages=[LANGUAGES[1]])
    assert not ex2.voice_matched


def test_matched_voice_f0_near_measurement():
    """Matched-voice renders should sit near the measured 101 Hz median."""
    from omnilingual_asr_tpu.train.synth import matched_voice
    rng = np.random.default_rng(0)
    f0s = [matched_voice(rng).f0 for _ in range(200)]
    assert 90 < float(np.median(f0s)) < 113


def test_batcher_english_fraction():
    from omnilingual_asr_tpu.config import tiny_config
    from omnilingual_asr_tpu.models.languages import id_for_language
    from omnilingual_asr_tpu.train.synth import SynthBatcher

    b = SynthBatcher(tiny_config(), batch_size=4, window_seconds=2.0,
                     english_fraction=1.0, voice_match_p=1.0,
                     real_fraction=0.0, codeswitch_fraction=0.0,
                     n_threads=1, prefetch=1, seed=11)
    try:
        batch = next(iter(b))
    finally:
        b.close()
    en = id_for_language("English")
    assert (batch["lid_label"] == en).all()
    # matched-voice English draws carry the real voice's speaker label 0
    assert (batch["speaker_label"] == 0).all()


def test_sentence_bank_sampling_respects_word_budget():
    from omnilingual_asr_tpu.train.english_text import (
        SENTENCES,
        sample_sentence,
    )
    assert len(SENTENCES) > 100
    rng = np.random.default_rng(0)
    for _ in range(50):
        s = sample_sentence(rng, min_words=2, max_words=5)
        assert 2 <= len(s.split()) <= 5
        assert s.islower()


def test_english_sentence_examples():
    from omnilingual_asr_tpu.train.english_text import english_bank_words
    from omnilingual_asr_tpu.train.synth import LANGUAGES, make_example

    bank = english_bank_words()
    rng = np.random.default_rng(5)
    ex = make_example(rng, languages=[LANGUAGES[0]], english_sentence_p=1.0)
    assert all(w in bank for w in ex.text.split())
    assert ex.translation is None
    assert len(ex.char_spans) == len(ex.text)
    assert np.isfinite(ex.samples).all()


def test_lexicon_includes_bank_words():
    from omnilingual_asr_tpu.ops.lexicon import synth_lexicon

    lm = synth_lexicon()
    st = lm.start()
    total = 0.0
    for b in b"monument ":
        st, d = lm.advance(st, b)
        total += d
    # in-lexicon word: no OOV byte penalties on the way in, completion
    # charged at the boundary with its (small) unigram logp
    assert total > lm.oov_byte_logp * 4


def test_inflection_suffix_decomposition():
    """Regular inflections reuse the stem's pronunciation with the right
    suffix voicing (the pre-fix rules produced W AE L K T, N AE M EH S)."""
    cases = {
        "walked": "W AO K T",       # exception stem + voiceless T
        "names": "N EY M Z",        # magic-e stem + voiced Z
        "faces": "F EY S IH Z",     # sibilant stem: syllabic plural
        "carried": "K AE R IY D",   # -ied -> stem y
        "planted": "P L AE N T AH D",   # t/d stem: AH D
        "friends": "F R EH N D Z",
    }
    for w, want in cases.items():
        got = " ".join(p for ph, _, _ in g2p_word(w) for p in ph)
        assert got == want, (w, got, want)
        chunks = g2p_word(w)
        assert chunks[0][1] == 0 and chunks[-1][2] == len(w)
        for a, b in zip(chunks, chunks[1:]):
            assert a[2] == b[1]
