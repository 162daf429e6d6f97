"""omnilingual_asr_tpu: TPU-native omnilingual speech transcription.

The framework behind the drop-in `omnilingual_asr` package: JAX/XLA/Pallas
compute, C++ audio runtime, mesh parallelism (DP/TP/PP/SP/EP), training and
serving. See README.md / ARCHITECTURE.md.
"""

__version__ = "0.2.0"

from .config import PipelineConfig, tiny_config  # noqa: F401
from .types import (  # noqa: F401
    TranscriptSegment,
    TranscriptionResult,
    WordTimestamp,
)

__all__ = [
    "__version__",
    "PipelineConfig",
    "tiny_config",
    "TranscriptSegment",
    "TranscriptionResult",
    "WordTimestamp",
    "TranscriptionEngine",
]


def __getattr__(name):
    # Lazy: importing the engine pulls in jax; keep bare imports light.
    if name == "TranscriptionEngine":
        from .engine import TranscriptionEngine

        return TranscriptionEngine
    raise AttributeError(name)
