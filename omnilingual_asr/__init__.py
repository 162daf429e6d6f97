"""Omnilingual ASR — TPU-native speech transcription.

Drop-in replacement for the reference package (reference
src/omnilingual_asr/__init__.py:9-25): identical exports and version, but all
inference runs locally on TPU via JAX/XLA/Pallas instead of the Gemini API.
"""

__version__ = "0.2.0"

from omnilingual_asr.diarization import GeminiDiarizedTranscriptionPipeline
from omnilingual_asr.models.inference import (
    GeminiASRPipeline,
    GeminiTranscriptionResult,
    GeminiTranscriptSegment,
)

__all__ = [
    "__version__",
    "GeminiASRPipeline",
    "GeminiTranscriptionResult",
    "GeminiTranscriptSegment",
    "GeminiDiarizedTranscriptionPipeline",
]
