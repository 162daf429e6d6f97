"""Orthography-constrained decode tests."""

import numpy as np

from omnilingual_asr_tpu.config import VocabConfig
from omnilingual_asr_tpu.models.orthography import (
    allowed_bytes,
    ctc_logit_mask,
)

VOCAB = VocabConfig()


class TestAllowedBytes:
    def test_unknown_script_unrestricted(self):
        assert allowed_bytes("klingon") is None
        assert allowed_bytes("") is None

    def test_latin_allows_ascii_letters(self):
        a = allowed_bytes("latin")
        assert ord("a") in a and ord("Z") in a
        assert 0x20 in a  # space
        # no CJK lead bytes
        assert "中".encode()[0] not in a

    def test_cyrillic(self):
        a = allowed_bytes("cyrillic")
        for b in "Привет".encode():
            assert b in a, hex(b)
        # plain ascii letters are not cyrillic
        assert ord("a") not in a

    def test_lisu(self):
        a = allowed_bytes("lisu")
        for b in "ꓟꓳ".encode():
            assert b in a, hex(b)

    def test_han(self):
        a = allowed_bytes("han")
        for b in "中文".encode():
            assert b in a

    def test_digits_and_punct_everywhere(self):
        for script in ("latin", "cyrillic", "han", "arabic"):
            a = allowed_bytes(script)
            for ch in "0123456789,.?! ":
                assert ord(ch) in a, (script, ch)


class TestMask:
    def test_mask_shape_and_blank(self):
        m = ctc_logit_mask("cyrillic", VOCAB)
        assert m.shape == (VOCAB.vocab_size,)
        assert m[VOCAB.blank_id] == 0.0
        # padding classes always blocked
        assert (m[1 + 256:] < -1e29).all()

    def test_unrestricted_allows_all_bytes(self):
        m = ctc_logit_mask(None, VOCAB)
        assert (m[1:257] == 0.0).all()

    def test_restricted_blocks_foreign_script(self):
        m = ctc_logit_mask("latin", VOCAB)
        cyr_lead = "П".encode()[0]
        assert m[VOCAB.byte_to_id(cyr_lead)] < -1e29
        assert m[VOCAB.byte_to_id(ord("a"))] == 0.0

    def test_engine_accepts_orthography(self, tmp_path):
        import wave

        from omnilingual_asr_tpu.config import tiny_config
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        p = tmp_path / "a.wav"
        x = (np.sin(np.arange(16000) * 0.05) * 15000).astype("<i2")
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(x.tobytes())
        eng = TranscriptionEngine(config=tiny_config(),
                                  batch_windows_per_device=1,
                                  window_seconds=5.0)
        res = eng.transcribe(p, orthography="lisu")
        # every decoded character must be Lisu / digits / punctuation
        import unicodedata

        for seg in res.segments:
            for ch in seg.text:
                if ch.isascii():
                    continue
                assert 0xA4D0 <= ord(ch) <= 0xA4FF or \
                    unicodedata.category(ch).startswith(("P", "Z")), ch
