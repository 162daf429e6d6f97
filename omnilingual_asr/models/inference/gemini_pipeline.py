"""Engine-level public API — compatibility module.

Re-exposes the reference's engine surface (reference
src/omnilingual_asr/models/inference/gemini_pipeline.py): the
`GeminiASRPipeline` class name, the result dataclasses, the timestamp/MIME
helpers, and the chunking utilities — all backed by local TPU compute.
Dataclass field sets match the reference exactly (:39-70) so downstream code
(e.g. the web server's hasattr-probing serializer, reference
workflows/wav2elan_web/app.py:231-254) keeps working.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

from omnilingual_asr_tpu.audio.decode import get_audio_duration, get_mime_type
from omnilingual_asr_tpu.config import ChunkingConfig
from omnilingual_asr_tpu.engine import TranscriptionEngine
from omnilingual_asr_tpu.types import (
    TranscriptSegment as GeminiTranscriptSegment,
    TranscriptionResult as GeminiTranscriptionResult,
    WordTimestamp,
    parse_timestamp,
)

# Long-audio constants (reference gemini_pipeline.py:216-219). Locally the
# windows shard over the device mesh, but the names and values are preserved
# as the public operational envelope.
_CHUNKING = ChunkingConfig()
CHUNK_DURATION_SECONDS = int(_CHUNKING.chunk_duration_s)
MIN_DURATION_FOR_CHUNKING = int(_CHUNKING.min_duration_for_chunking_s)
MAX_PARALLEL_CHUNKS = _CHUNKING.max_parallel_chunks


def split_audio_into_chunks(
    audio_path: Path,
    chunk_duration: float = CHUNK_DURATION_SECONDS,
    output_dir: Optional[Path] = None,
) -> List[Tuple[Path, float]]:
    """Compatibility shim for the reference's ffmpeg chunk splitter
    (reference gemini_pipeline.py:243-310).

    The TPU engine windows audio in-memory and never materializes chunk
    files, so this helper only computes the (path, offset) plan the reference
    would have produced: the same source path with each chunk's start offset.
    Returns [(audio_path, 0.0)] when the duration can't be determined, like
    the reference (:252-254).
    """
    audio_path = Path(audio_path)
    total = get_audio_duration(audio_path)
    if total <= 0:
        return [(audio_path, 0.0)]
    chunks: List[Tuple[Path, float]] = []
    start = 0.0
    while start < total:
        chunks.append((audio_path, start))
        start += chunk_duration
    return chunks if chunks else [(audio_path, 0.0)]


# The engine itself is reference-surface-compatible (same methods, progress
# contract and retry/chunking semantics — see omnilingual_asr_tpu/engine.py).
GeminiASRPipeline = TranscriptionEngine

__all__ = [
    "GeminiASRPipeline",
    "GeminiTranscriptSegment",
    "GeminiTranscriptionResult",
    "WordTimestamp",
    "parse_timestamp",
    "get_mime_type",
    "get_audio_duration",
    "split_audio_into_chunks",
    "CHUNK_DURATION_SECONDS",
    "MIN_DURATION_FOR_CHUNKING",
    "MAX_PARALLEL_CHUNKS",
]
