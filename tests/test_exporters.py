"""Exporter format tests (EAF / TextGrid / TXT / SRT / JSON)."""

import json

import pytest

from omnilingual_asr_tpu.exporters import (
    build_eaf,
    build_json,
    build_plain_text,
    build_srt,
    build_textgrid,
    export_transcript,
)

DATA = {
    "file_name": "demo.wav",
    "audio_url": "/api/audio/1",
    "summary": "Two speakers, neutral tone.",
    "detected_languages": [
        {"language": "English", "code": "en"},
        {"language": "Lisu", "code": "lis"},
    ],
    "segments": [
        {"start": 0.352, "end": 2.5, "speaker": "Speaker 1",
         "text": "Hello & <world>", "language": "English",
         "language_code": "en", "languages": [{"name": "English", "code": "en"}],
         "emotion": "neutral", "translation": None, "words": None},
        {"start": 2.6, "end": 4.0, "speaker": "Speaker 2",
         "text": "ꓟꓳ ꓠꓬ", "language": "Lisu", "language_code": "lis",
         "languages": [{"name": "Lisu", "code": "lis"}],
         "emotion": "happy", "translation": "Good morning", "words": None},
        {"start": 4.5, "end": 6.0, "speaker": "Speaker 1",
         "text": "Bye \"friend\"", "language": "English",
         "language_code": "en", "languages": [{"name": "English", "code": "en"}],
         "emotion": "neutral", "translation": "null", "words": None},
    ],
}


class TestEAF:
    def test_structure(self):
        eaf = build_eaf(DATA, date="2026-01-01T00:00:00.000Z")
        assert eaf.startswith('<?xml version="1.0" encoding="UTF-8"?>')
        assert 'DATE="2026-01-01T00:00:00.000Z"' in eaf
        assert 'TIME_UNITS="milliseconds"' in eaf
        # 3 segments -> 6 time slots, ms-rounded
        assert '<TIME_SLOT TIME_SLOT_ID="ts1" TIME_VALUE="352"/>' in eaf
        assert '<TIME_SLOT TIME_SLOT_ID="ts6" TIME_VALUE="6000"/>' in eaf
        # Speaker tiers + per-feature tiers
        assert 'TIER_ID="Speaker 1"' in eaf
        assert 'TIER_ID="Speaker 2"' in eaf
        assert 'TIER_ID="Speaker 1_language"' in eaf
        assert 'TIER_ID="Speaker 2_emotion"' in eaf
        # Translation tier only for the valid translation (Speaker 2);
        # "null" string must be filtered (reference app.js:1443).
        assert 'TIER_ID="Speaker 2_translation"' in eaf
        assert 'TIER_ID="Speaker 1_translation"' not in eaf
        # XML escaping
        assert "Hello &amp; &lt;world&gt;" in eaf
        # Linguistic types present
        for t in ("transcription", "language", "emotion", "translation"):
            assert f'LINGUISTIC_TYPE_ID="{t}"' in eaf

    def test_annotation_id_interleaving(self):
        # ids allocated per segment: transcript, language, emotion,
        # translation (reference buildEAF order)
        eaf = build_eaf(DATA, date="x")
        # Segment 1: a1 transcript, a2 language, a3 emotion (no translation)
        assert 'ANNOTATION_ID="a1" TIME_SLOT_REF1="ts1"' in eaf
        # Segment 2: a4 transcript, a5 lang, a6 emo, a7 translation
        assert 'ANNOTATION_ID="a7"' in eaf
        assert "Good morning" in eaf

    def test_parses_as_xml(self):
        import xml.etree.ElementTree as ET

        root = ET.fromstring(build_eaf(DATA, date="x"))
        assert root.tag == "ANNOTATION_DOCUMENT"
        tiers = root.findall("TIER")
        assert len(tiers) == 2 + 2 + 2 + 1  # transcript+lang+emo per spk, 1 transl

    def test_golden_asset_shape(self):
        """Our EAF uses the same element vocabulary as the bundled golden
        export (reference gettysburg.eaf)."""
        golden = open("/root/reference/gettysburg.eaf").read()
        ours = build_eaf(DATA, date="x")
        for el in ("ANNOTATION_DOCUMENT", "TIME_ORDER", "TIME_SLOT",
                   "ALIGNABLE_ANNOTATION", "ANNOTATION_VALUE",
                   "LINGUISTIC_TYPE"):
            assert el in golden and el in ours


class TestTextGrid:
    def test_structure(self):
        tg = build_textgrid(DATA)
        assert tg.startswith('File type = "ooTextFile"\nObject class = "TextGrid"\n')
        # trailing-space parity lines
        assert "xmin = 0 \n" in tg
        assert "tiers? <exists> \n" in tg
        assert 'class = "IntervalTier" \n' in tg
        assert "size = 2" in tg  # two speaker tiers
        assert "xmax = 6.000000" in tg
        # gap-filled empty intervals exist
        assert 'text = ""' in tg
        # quote escaping: " -> ""
        assert 'text = "Bye ""friend"""' in tg

    def test_gap_fill_counts(self):
        tg = build_textgrid(DATA)
        # Speaker 1: [0-0.352 gap][0.352-2.5][2.5-4.5 gap][4.5-6.0] = 4
        assert "intervals: size = 4" in tg
        # Speaker 2: [0-2.6 gap][2.6-4.0][4.0-6.0 gap] = 3
        assert "intervals: size = 3" in tg


class TestTxt:
    def test_structure(self):
        txt = build_plain_text(DATA)
        assert txt.startswith("=== Summary ===")
        assert "- English (en)" in txt
        assert "- Lisu (lis)" in txt
        assert "[Speaker 1]" in txt
        assert "0:00 Hello & <world>" in txt
        assert "         → Good morning" in txt
        # literal "null" translation filtered (reference app.js:1727)
        assert "→ null" not in txt

    def test_speaker_grouping(self):
        txt = build_plain_text(DATA)
        # Speaker 1 appears twice (segment 3 switches back)
        assert txt.count("[Speaker 1]") == 2


class TestSRT:
    def test_structure(self):
        srt = build_srt(DATA)
        blocks = srt.split("\n\n")
        assert blocks[0].splitlines()[0] == "1"
        assert "00:00:00,352 --> 00:00:02,500" in srt
        # multi-speaker -> prefix
        assert "[Speaker 2] ꓟꓳ ꓠꓬ" in srt

    def test_single_speaker_no_prefix(self):
        one = {"segments": [dict(DATA["segments"][0])]}
        srt = build_srt(one)
        assert "[Speaker" not in srt


class TestJson:
    def test_roundtrip(self):
        s = build_json(DATA)
        assert json.loads(s) == DATA
        assert "ꓟꓳ" in s  # ensure_ascii=False like JS

    def test_dispatch(self):
        assert export_transcript(DATA, "srt") == build_srt(DATA)
        with pytest.raises(ValueError):
            export_transcript(DATA, "nope")


class TestGoldens:
    """Byte-stability regression guard: exporter output is frozen under
    tests/goldens/ — any formatting drift fails here."""

    def _golden(self, name):
        from pathlib import Path

        return (Path(__file__).parent / "goldens" / name).read_text(
            encoding="utf-8")

    def test_eaf_golden(self):
        assert build_eaf(DATA, date="2026-01-01T00:00:00.000Z") == \
            self._golden("demo.eaf")

    def test_textgrid_golden(self):
        assert build_textgrid(DATA) == self._golden("demo.TextGrid")

    def test_srt_golden(self):
        assert build_srt(DATA) == self._golden("demo.srt")

    def test_txt_golden(self):
        assert build_plain_text(DATA) == self._golden("demo.txt")

    def test_json_golden(self):
        assert build_json(DATA) == self._golden("demo.json")


class TestEAFWordTiers:
    """Golden-artifact shape: the bundled gettysburg.eaf has
    {speaker}_words tiers with a 'word' LINGUISTIC_TYPE — producible here
    because the CTC alignment yields real word timestamps."""

    DATA_WORDS = {
        "file_name": "w.wav", "audio_url": "",
        "segments": [
            {"start": 0.0, "end": 2.0, "speaker": "SPEAKER_00",
             "text": "hello world", "language": None, "emotion": None,
             "translation": None,
             "words": [{"word": "hello", "start": 0.1, "end": 0.8},
                       {"word": "world", "start": 0.9, "end": 1.9}]},
        ],
    }

    def test_word_tiers_emitted(self):
        eaf = build_eaf(self.DATA_WORDS, date="x", include_words=True)
        assert 'TIER_ID="SPEAKER_00_words"' in eaf
        assert 'LINGUISTIC_TYPE_REF="word"' in eaf
        assert 'LINGUISTIC_TYPE_ID="word" TIME_ALIGNABLE="true"' in eaf
        assert "<ANNOTATION_VALUE>hello</ANNOTATION_VALUE>" in eaf
        # word time slots in ms
        assert 'TIME_VALUE="100"' in eaf and 'TIME_VALUE="1900"' in eaf
        import xml.etree.ElementTree as ET

        ET.fromstring(eaf)  # well-formed

    def test_default_excludes_word_tiers(self):
        eaf = build_eaf(self.DATA_WORDS, date="x")
        assert "_words" not in eaf
