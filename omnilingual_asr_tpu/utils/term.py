"""Clean SIGTERM handling for TPU-holding processes.

Python's default SIGTERM disposition kills the process WITHOUT running
atexit hooks — and on pooled-TPU backends the accelerator lease release is
an atexit-time advisory message. A trainer or server killed with plain
``kill <pid>`` (e.g. by a training-queue watchdog) therefore orphans the
pool-side claim, and every later process blocks ~25 min in claim retry
(round-3 operational notes: one orphaned lease starved the queue for
hours). Installing this handler turns SIGTERM into ``SystemExit``, so
``finally:`` blocks, context managers, and atexit all run.
"""

from __future__ import annotations

import signal
import sys


def install_sigterm_exit() -> None:
    """Route SIGTERM through ``sys.exit(0)`` (idempotent, main thread
    only — a no-op where signals can't be installed)."""
    try:
        signal.signal(
            signal.SIGTERM, lambda _sig, _frm: sys.exit(0))
    except (ValueError, OSError):  # non-main thread / exotic platform
        pass
