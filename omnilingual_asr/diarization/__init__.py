from omnilingual_asr.diarization.pipeline import (
    DiarizedTranscriptSegment,
    GeminiDiarizedTranscriptionPipeline,
    WordTimestamp,
)

__all__ = [
    "DiarizedTranscriptSegment",
    "GeminiDiarizedTranscriptionPipeline",
    "WordTimestamp",
]
