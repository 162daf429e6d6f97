"""CTC decode + segmentation tests."""

import numpy as np

from omnilingual_asr_tpu.config import DecodeConfig, VocabConfig
from omnilingual_asr_tpu.ops.ctc import (
    collapse_ctc,
    ctc_loss,
    segments_from_alignment,
    text_to_byte_labels,
)

VOCAB = VocabConfig()
DEC = DecodeConfig()


def ids_for(text: str):
    return [VOCAB.byte_to_id(b) for b in text.encode()]


class TestCollapse:
    def test_repeats_and_blanks(self):
        h = ids_for("h")[0]
        i = ids_for("i")[0]
        frames = np.array([0, h, h, 0, 0, i, i, i, 0])
        units = collapse_ctc(frames)
        assert [u.byte_id for u in units] == [h, i]
        assert [u.frame for u in units] == [1, 5]

    def test_double_letter_needs_blank(self):
        l = ids_for("l")[0]
        frames = np.array([l, l, 0, l])  # "ll" via blank separator
        units = collapse_ctc(frames)
        assert [u.byte_id for u in units] == [l, l]

    def test_empty(self):
        assert collapse_ctc(np.zeros(10, dtype=int)) == []


class TestSegmentation:
    def make_frames(self, phrases, gap_frames, frame_ids_len=None):
        """Lay out phrases separated by blank runs; a blank frame is inserted
        between repeated bytes so CTC collapse preserves doubles ("ll")."""
        frames = []
        for p in phrases:
            prev = None
            for b in ids_for(p):
                if b == prev:
                    frames.append(0)
                frames.append(b)
                prev = b
            frames.extend([0] * gap_frames)
        return np.array(frames)

    def test_splits_on_blank_gap(self):
        # frame_dur 0.04 s; gap threshold 0.35 s -> 9 frames
        frames = self.make_frames(["hello world", "next phrase"], gap_frames=12)
        segs = segments_from_alignment(frames, 0.04, VOCAB, DEC)
        assert [s.text for s in segs] == ["hello world", "next phrase"]
        assert segs[0].start == 0.0
        assert segs[1].start > segs[0].end

    def test_no_split_on_short_gap(self):
        frames = self.make_frames(["hello", "world"], gap_frames=3)
        segs = segments_from_alignment(frames, 0.04, VOCAB, DEC)
        assert len(segs) == 1
        # phrases are joined by blank frames, not space bytes
        assert segs[0].text == "helloworld"

    def test_time_offset(self):
        frames = self.make_frames(["hi"], gap_frames=2)
        segs = segments_from_alignment(frames, 0.04, VOCAB, DEC,
                                       time_offset_s=300.0)
        assert segs[0].start >= 300.0

    def test_end_after_start_fixup(self):
        # single-unit segment: end = start + frame_dur; if degenerate, +1.0
        frames = np.array(ids_for("a"))
        segs = segments_from_alignment(frames, 0.04, VOCAB, DEC)
        assert segs[0].end > segs[0].start

    def test_word_timestamps(self):
        frames = self.make_frames(["one two three"], gap_frames=2)
        segs = segments_from_alignment(frames, 0.04, VOCAB, DEC)
        words = segs[0].words
        assert [w.word for w in words] == ["one", "two", "three"]
        assert words[0].start < words[1].start < words[2].start
        assert all(w.end > w.start for w in words)

    def test_utf8_multibyte(self):
        frames = self.make_frames(["ꓟꓳ"], gap_frames=2)  # Lisu chars, 3 bytes each
        segs = segments_from_alignment(frames, 0.04, VOCAB, DEC)
        assert segs[0].text == "ꓟꓳ"

    def test_max_length_force_split(self):
        # continuous speech with tiny gaps must split around segment_max_s
        text = "a " * 200  # 400 frames = 16 s at 0.04 s/frame
        frames = self.make_frames([text.strip()], gap_frames=1)
        segs = segments_from_alignment(frames, 0.04, VOCAB, DEC)
        assert len(segs) >= 2
        for s in segs:
            assert s.end - s.start <= DEC.segment_max_s + 1.0


class TestLabels:
    def test_text_to_byte_labels(self):
        ids, mask = text_to_byte_labels("hi", VOCAB, max_len=8)
        assert mask.sum() == 2
        assert ids[0] == VOCAB.byte_to_id(ord("h"))

    def test_ctc_loss_decreases_for_matching_logits(self):
        import jax.numpy as jnp

        B, T, V, L = 2, 20, VOCAB.vocab_size, 8
        labels = np.zeros((B, L), np.int32)
        lmask = np.zeros((B, L), bool)
        ids, m = text_to_byte_labels("hey", VOCAB, L)
        labels[0], lmask[0] = ids, m
        labels[1], lmask[1] = ids, m
        logit_mask = np.ones((B, T), bool)
        rng = np.random.default_rng(0)
        random_logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
        loss_rand = ctc_loss(random_logits, jnp.asarray(logit_mask),
                             jnp.asarray(labels), jnp.asarray(lmask))
        # Build "good" logits strongly favoring the right alignment.
        good = np.full((B, T, V), -10.0, np.float32)
        seq = ids_for("hey")
        for b in range(B):
            t = 0
            for s in seq:
                good[b, t, s] = 10.0
                t += 2
            for tt in range(t, T):
                good[b, tt, 0] = 10.0
            for tt in range(0, t, 2):
                good[b, tt + 1, 0] = 10.0
        loss_good = ctc_loss(jnp.asarray(good), jnp.asarray(logit_mask),
                             jnp.asarray(labels), jnp.asarray(lmask))
        assert float(loss_good) < float(loss_rand)
        assert float(loss_good) < 1.0
