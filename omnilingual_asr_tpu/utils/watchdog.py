"""Trainer-watchdog decision logic, extracted so it is unit-testable.

The round-4 flagship campaign catalogued three pool-side wedge signatures
(TRAINING_NOTES.md, "the pool turned hostile"):

  (a) probe timeouts — the claim leg hangs before any process starts;
      guarded by running the probe itself under ``timeout`` (not here).
  (b) wedge at the FIRST step after a successful large H2D: the trainer
      process lives forever but the metrics log is NEVER written. The
      round-4 ``run_watched`` only fired on a *stale non-empty* log, so two
      attempts sat wedged for 27+ minutes — the empty-log case needs its
      own limit (observed max clean startup incl. compile+pool fill:
      ~15 min; 26 min was already wedged).
  (c) hard mid-run wedge: metrics stop, all threads in futex wait. The
      classic stale-log check catches this.

The queue scripts (tools/r5b_flagship.sh run_watched) implement exactly
:func:`should_kill` in bash; this module is the single place the decision
table is written down and exercised by tests/test_watchdog.py on fabricated
log states. ``python -m omnilingual_asr_tpu.utils.watchdog --pid P --log L``
runs the same logic as a standalone supervisor for ad-hoc launches.
"""

from __future__ import annotations

import dataclasses
import os
import time
from pathlib import Path
from typing import Optional, Tuple

__all__ = ["WatchdogPolicy", "should_kill", "observe", "watch"]


@dataclasses.dataclass(frozen=True)
class WatchdogPolicy:
    """Kill thresholds, in seconds.

    ``stale_s``: max age of the newest line in a non-empty metrics log
    (signature (c)); trainer eval cadence bounds the healthy gap — 1500 s
    covers a 500-step eval interval at the slowest observed 0.5 steps/s.

    ``empty_limit_s``: max total runtime with a still-empty metrics log
    (signature (b)); must exceed the worst clean startup (claim + compile
    + device-pool fill ≈ 15 min) by a safety margin.
    """

    stale_s: float = 1500.0
    empty_limit_s: float = 1560.0


def should_kill(log_size: int, log_age_s: Optional[float],
                elapsed_s: float,
                policy: WatchdogPolicy = WatchdogPolicy(),
                ) -> Tuple[bool, str]:
    """Decide whether a watched trainer is wedged.

    log_size: bytes currently in the metrics log (0 = never written).
    log_age_s: seconds since the log's last modification (None if absent).
    elapsed_s: seconds since the trainer was started.
    Returns (kill?, reason). reason is "" when healthy.
    """
    if log_size > 0 and log_age_s is not None:
        if log_age_s > policy.stale_s:
            return True, (f"stale log: no metrics for {log_age_s:.0f}s "
                          f"> {policy.stale_s:.0f}s (wedge signature (c))")
        return False, ""
    # Empty (or missing) log: the trainer has not reached its first
    # metric line. Healthy only while within the startup envelope.
    if elapsed_s > policy.empty_limit_s:
        return True, (f"empty log after {elapsed_s:.0f}s "
                      f"> {policy.empty_limit_s:.0f}s (wedge signature (b))")
    return False, ""


def observe(log_path: Path, started_at: float,
            now: Optional[float] = None) -> Tuple[int, Optional[float], float]:
    """Filesystem observation feeding :func:`should_kill`."""
    now = time.time() if now is None else now
    try:
        st = os.stat(log_path)
        return st.st_size, max(0.0, now - st.st_mtime), now - started_at
    except OSError:
        return 0, None, now - started_at


def watch(pid: int, log_path: Path,
          policy: WatchdogPolicy = WatchdogPolicy(),
          poll_s: float = 60.0, kill_grace_s: float = 10.0) -> int:
    """Supervise ``pid`` until it exits or wedges. Returns 0 if the process
    exited on its own, 97 if the watchdog killed it (the queue scripts'
    convention for 'wedged, retry the segment')."""
    import signal

    def alive(p: int) -> bool:
        try:
            os.kill(p, 0)
        except ProcessLookupError:
            return False
        # A zombie (exited, unreaped by its real parent) still answers
        # kill(0); it is NOT running and must count as a clean exit.
        try:
            with open(f"/proc/{p}/stat") as f:
                if f.read().rsplit(")", 1)[1].split()[0] == "Z":
                    return False
        except OSError:
            return False
        return True

    started = time.time()
    while True:
        if not alive(pid):
            return 0
        time.sleep(poll_s)
        size, age, elapsed = observe(Path(log_path), started)
        kill, reason = should_kill(size, age, elapsed, policy)
        if kill:
            print(f"watchdog: {reason}; killing {pid}", flush=True)
            try:
                os.kill(pid, signal.SIGTERM)
                time.sleep(kill_grace_s)
                os.kill(pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            return 97


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--log", type=Path, required=True)
    ap.add_argument("--stale-s", type=float, default=1500.0)
    ap.add_argument("--empty-limit-s", type=float, default=1560.0)
    ap.add_argument("--poll-s", type=float, default=60.0)
    args = ap.parse_args()
    raise SystemExit(watch(
        args.pid, args.log,
        WatchdogPolicy(stale_s=args.stale_s,
                       empty_limit_s=args.empty_limit_s),
        poll_s=args.poll_s))


if __name__ == "__main__":
    main()
