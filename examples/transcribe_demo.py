"""Demo: transcribe the bundled Gettysburg recording end-to-end on TPU and
export every format (the BASELINE.json config #1 flow).

    python examples/transcribe_demo.py [audio_path]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from omnilingual_asr import GeminiDiarizedTranscriptionPipeline  # noqa: E402
from omnilingual_asr_tpu.exporters import EXPORTERS  # noqa: E402


def main():
    audio = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "/root/reference/gettysburg.wav")
    out_dir = Path("demo_out")
    out_dir.mkdir(exist_ok=True)

    pipe = GeminiDiarizedTranscriptionPipeline()
    print(f"Transcribing {audio.name} ...")
    segments = pipe.transcribe(
        str(audio), word_timestamps=True,
        progress_callback=lambda step, i: print(f"  [{i}] {step}"))

    print(f"\n{len(segments)} segments; summary: {pipe.summary}")
    for seg in segments[:10]:
        print(f"  {seg.start:7.2f}-{seg.end:7.2f} [{seg.speaker}] "
              f"({seg.language_code}/{seg.emotion}) {seg.text[:60]}")

    # Exports (byte-compatible with the reference SPA's builders).
    entry = {
        "file_name": audio.name,
        "audio_url": f"file://{audio}",
        "summary": pipe.summary,
        "detected_languages": pipe.detected_languages,
        "segments": [{
            "start": s.start, "end": s.end, "speaker": s.speaker,
            "text": s.text, "language": s.language,
            "language_code": s.language_code, "languages": s.languages,
            "emotion": s.emotion, "translation": s.translation,
            "words": [{"word": w.word, "start": w.start, "end": w.end}
                      for w in (s.words or [])] or None,
        } for s in segments],
    }
    for fmt, build in EXPORTERS.items():
        ext = {"textgrid": "TextGrid"}.get(fmt, fmt)
        path = out_dir / f"{audio.stem}.{ext}"
        path.write_text(build(entry), encoding="utf-8")
        print(f"wrote {path}")

    tr = pipe.gemini.last_trace
    if tr:
        print(f"\nRTF: {tr.rtf:.1f}x realtime "
              f"({tr.audio_hours_per_min_per_chip:.2f} audio-h/min/chip)")


if __name__ == "__main__":
    main()
