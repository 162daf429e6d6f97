"""Tracing / profiling utilities.

The reference's only observability is the 4-step progress callback and SSE
progress events (SURVEY §5 tracing row; reference diarization/pipeline.py:
89-90, app.py:304-314). That contract is preserved in the engine; this
module adds what a local TPU serving stack additionally needs:

- StageTrace: wall-time per pipeline stage + derived throughput counters
  (RTF, audio-hours/min/chip — the BASELINE.json headline metric);
- structured logging helpers (single-line JSON records);
- a jax.profiler context for capturing device traces to TensorBoard format.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

logger = logging.getLogger("omniasr")


@dataclass
class StageTrace:
    """Per-run stage timings for one transcription."""

    stages: Dict[str, float] = field(default_factory=dict)
    audio_seconds: float = 0.0
    n_chips: int = 1

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0)

    @property
    def total_seconds(self) -> float:
        return sum(self.stages.values())

    @property
    def rtf(self) -> float:
        """Real-time factor (audio seconds per wall second)."""
        t = self.total_seconds
        return self.audio_seconds / t if t > 0 else 0.0

    @property
    def audio_hours_per_min_per_chip(self) -> float:
        t = self.total_seconds
        if t <= 0 or self.n_chips <= 0:
            return 0.0
        return (self.audio_seconds / 3600.0) / (t / 60.0) / self.n_chips

    def to_dict(self) -> dict:
        return {
            "stages": dict(self.stages),
            "audio_seconds": self.audio_seconds,
            "total_seconds": self.total_seconds,
            "rtf": self.rtf,
            "audio_hours_per_min_per_chip": self.audio_hours_per_min_per_chip,
            "n_chips": self.n_chips,
        }

    def log(self, **extra):
        log_event("transcribe_trace", **self.to_dict(), **extra)


def log_event(event: str, **fields):
    """Single-line JSON structured log record."""
    logger.info(json.dumps({"event": event, **fields}, default=str))


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler device trace (TensorBoard format) when a
    log_dir is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
