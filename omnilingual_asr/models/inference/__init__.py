from omnilingual_asr.models.inference.gemini_pipeline import (
    GeminiASRPipeline,
    GeminiTranscriptionResult,
    GeminiTranscriptSegment,
    WordTimestamp,
)

__all__ = [
    "GeminiASRPipeline",
    "GeminiTranscriptionResult",
    "GeminiTranscriptSegment",
    "WordTimestamp",
]
