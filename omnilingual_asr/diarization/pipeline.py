"""Diarized transcription pipeline — the stable public API.

Byte-compatible with the reference facade
(reference src/omnilingual_asr/diarization/pipeline.py:15-126): same class
name, constructor keywords, `transcribe()` signature, progress-step contract
(uploading 0 / transcribing 1 / processing 2 / done 3) and
`DiarizedTranscriptSegment` field set. The backend is the local TPU engine
instead of the Gemini API, so no API key is needed (one passed is ignored).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional


@dataclass(frozen=True)
class WordTimestamp:
    """Word-level timestamp information (reference pipeline.py:15-20)."""

    word: str
    start: float
    end: float


@dataclass(frozen=True)
class DiarizedTranscriptSegment:
    """A transcribed segment with speaker and timing information.

    Field-for-field identical to reference pipeline.py:23-37. ``languages``
    carries the code-switching list ``[{"name": ..., "code": ...}, ...]``
    with the primary language first.
    """

    start: float
    end: float
    speaker: str
    text: str
    words: list[WordTimestamp] | None = None
    language: str | None = None
    language_code: str | None = None
    languages: list[dict] | None = None
    emotion: str | None = None
    translation: str | None = None


class GeminiDiarizedTranscriptionPipeline:
    """Transcription pipeline with built-in diarization, language detection,
    emotion analysis and translation — running locally on TPU.

    The class keeps its reference name (reference pipeline.py:39-46) so
    existing user code imports and runs unchanged.
    """

    def __init__(
        self,
        *,
        api_key: Optional[str] = None,
        model: str = "local-tpu",
        **engine_kwargs,
    ) -> None:
        """Args mirror the reference constructor (pipeline.py:46-61).
        ``api_key`` is accepted for compatibility and ignored — inference is
        local. Extra keyword args reach the TPU engine (config, mesh, ...)."""
        from omnilingual_asr_tpu.engine import TranscriptionEngine

        self.gemini = TranscriptionEngine(api_key=api_key, model=model,
                                          **engine_kwargs)
        self._summary: Optional[str] = None
        self._detected_languages: Optional[List[dict]] = None

    @property
    def summary(self) -> Optional[str]:
        """Summary from the last transcription (reference pipeline.py:63-66)."""
        return self._summary

    @property
    def detected_languages(self) -> Optional[List[dict]]:
        """Languages detected in the last transcription (pipeline.py:68-71)."""
        return self._detected_languages

    def transcribe(
        self,
        audio_path: str,
        *,
        word_timestamps: bool = False,
        progress_callback: Optional[Callable[[str, int], None]] = None,
        language: Optional[str] = None,
        speaker_count: Optional[str] = None,
        **kwargs,
    ) -> List[DiarizedTranscriptSegment]:
        """Transcribe audio with speaker diarization on local TPU.

        Signature and semantics match reference pipeline.py:74-126, with one
        upgrade: the local CTC alignment provides real word-level timestamps,
        so ``word_timestamps=True`` populates ``segment.words`` (the
        reference always returned None there, pipeline.py:115).
        """
        result = self.gemini.transcribe_with_retry(
            audio_path,
            progress_callback=progress_callback,
            language=language,
            speaker_count=speaker_count,
        )

        self._summary = result.summary
        self._detected_languages = result.detected_languages

        segments: List[DiarizedTranscriptSegment] = []
        for seg in result.segments:
            words = None
            if word_timestamps and seg.words:
                words = [WordTimestamp(word=w.word, start=w.start, end=w.end)
                         for w in seg.words]
            segments.append(DiarizedTranscriptSegment(
                start=seg.start,
                end=seg.end,
                speaker=seg.speaker,
                text=seg.text,
                words=words,
                language=seg.language,
                language_code=seg.language_code,
                languages=seg.languages,
                emotion=seg.emotion,
                translation=seg.translation,
            ))
        return segments
