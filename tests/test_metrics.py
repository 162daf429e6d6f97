"""WER/CER/DER metric tests + eval harness on the fake engine."""

import json

import pytest

from omnilingual_asr_tpu.utils.metrics import (
    aggregate_wer,
    cer,
    der,
    edit_distance,
    normalize_text,
    wer,
)


class TestEditDistance:
    def test_basic(self):
        assert edit_distance("kitten", "sitting") == 3
        assert edit_distance([], []) == 0
        assert edit_distance(["a"], []) == 1
        assert edit_distance("abc", "abc") == 0


class TestWER:
    def test_perfect(self):
        assert wer("hello world", "hello world") == 0.0

    def test_substitution(self):
        assert wer("hello world", "hello word") == 0.5

    def test_case_and_punct_normalized(self):
        assert wer("Hello, World!", "hello world") == 0.0

    def test_empty_ref(self):
        assert wer("", "") == 0.0
        assert wer("", "something") == 1.0

    def test_cer(self):
        assert cer("abc", "abd") == pytest.approx(1 / 3)
        assert cer("hello world", "helloworld") == 0.0  # spaces not counted

    def test_aggregate(self):
        out = aggregate_wer([("one two", "one two"), ("three four", "three for")])
        assert out["wer"] == 0.25
        assert out["n_ref_words"] == 4

    def test_normalize_keeps_apostrophes(self):
        assert normalize_text("don't stop") == "don't stop"


class TestDER:
    def test_perfect(self):
        turns = [(0.0, 5.0, "A"), (5.0, 10.0, "B")]
        assert der(turns, turns) == 0.0

    def test_label_permutation_is_free(self):
        ref = [(0.0, 5.0, "A"), (5.0, 10.0, "B")]
        hyp = [(0.0, 5.0, "Speaker 2"), (5.0, 10.0, "Speaker 1")]
        assert der(ref, hyp) == 0.0

    def test_confusion_counted(self):
        ref = [(0.0, 10.0, "A")]
        hyp = [(0.0, 5.0, "X"), (5.0, 10.0, "Y")]
        # one mapped speaker covers 5s, other 5s is confusion (collar eats a bit)
        d = der(ref, hyp)
        assert 0.3 < d < 0.6

    def test_missed_speech(self):
        ref = [(0.0, 10.0, "A")]
        hyp = [(0.0, 5.0, "A")]
        d = der(ref, hyp)
        assert 0.3 < d < 0.6

    def test_empty(self):
        assert der([], []) == 0.0


class TestHarness:
    def test_eval_on_fake_engine(self, tmp_path):
        import io
        import wave

        import numpy as np

        from omnilingual_asr_tpu.eval.harness import evaluate
        from omnilingual_asr_tpu.testing import FakeEngine, demo_result

        wav = tmp_path / "a.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(np.zeros(8000, "<i2").tobytes())
        ref_text = " ".join(s.text for s in demo_result().segments)
        manifest = tmp_path / "manifest.jsonl"
        manifest.write_text(json.dumps({
            "audio": "a.wav", "text": ref_text,
            "turns": [[0.0, 3.2, "Speaker 1"], [3.5, 6.0, "Speaker 2"]],
        }) + "\n")
        report = evaluate(FakeEngine(), manifest)
        assert report.wer == 0.0
        assert report.n_files == 1
        assert report.der_mean == 0.0
        assert json.loads(report.to_json())["wer"] == 0.0
