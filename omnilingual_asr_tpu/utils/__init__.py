"""Metrics, tracing, logging utilities."""

from .metrics import cer, der, wer  # noqa: F401
from .tracing import StageTrace, log_event  # noqa: F401
