"""Watchdog decision logic on fabricated log states (VERDICT r4 weak #6):
each of the round-4 wedge signatures (TRAINING_NOTES.md) must map to the
right kill/keep decision, including the empty-log blind spot that cost two
training attempts."""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

from omnilingual_asr_tpu.utils.watchdog import (
    WatchdogPolicy,
    observe,
    should_kill,
    watch,
)

POLICY = WatchdogPolicy(stale_s=1500.0, empty_limit_s=1560.0)


class TestSignatureB_EmptyLog:
    """Wedge at first step after H2D: the metrics log is never written."""

    def test_empty_log_within_startup_envelope_is_healthy(self):
        kill, _ = should_kill(log_size=0, log_age_s=None,
                              elapsed_s=900.0, policy=POLICY)
        assert not kill   # 15 min: worst observed CLEAN startup

    def test_empty_log_past_envelope_kills(self):
        kill, reason = should_kill(log_size=0, log_age_s=None,
                                   elapsed_s=1620.0, policy=POLICY)
        assert kill and "(b)" in reason   # 27 min: observed wedged

    def test_missing_log_treated_as_empty(self):
        # The logfile may not even exist yet (trainer redirects on first
        # write); decision must be identical to the empty case.
        kill, reason = should_kill(log_size=0, log_age_s=None,
                                   elapsed_s=2000.0, policy=POLICY)
        assert kill and "empty" in reason


class TestSignatureC_StaleLog:
    """Hard mid-run wedge: metrics stop, all threads in futex wait."""

    def test_fresh_metrics_are_healthy(self):
        kill, _ = should_kill(log_size=4096, log_age_s=30.0,
                              elapsed_s=7200.0, policy=POLICY)
        assert not kill

    def test_eval_gap_below_threshold_is_healthy(self):
        # A 500-step eval at 0.5 steps/s keeps the log silent ~17 min;
        # must NOT kill inside the healthy cadence.
        kill, _ = should_kill(log_size=4096, log_age_s=1100.0,
                              elapsed_s=7200.0, policy=POLICY)
        assert not kill

    def test_silent_metrics_past_threshold_kill(self):
        kill, reason = should_kill(log_size=4096, log_age_s=1700.0,
                                   elapsed_s=7200.0, policy=POLICY)
        assert kill and "(c)" in reason

    def test_long_healthy_run_not_killed_by_elapsed(self):
        # elapsed >> empty_limit must NOT matter once the log has content:
        # only staleness governs a producing trainer.
        kill, _ = should_kill(log_size=1 << 20, log_age_s=10.0,
                              elapsed_s=100_000.0, policy=POLICY)
        assert not kill


class TestObserve:
    def test_missing_file(self, tmp_path):
        size, age, elapsed = observe(tmp_path / "nope.jsonl",
                                     started_at=time.time() - 5.0)
        assert size == 0 and age is None and 4.0 < elapsed < 30.0

    def test_existing_file(self, tmp_path):
        p = tmp_path / "metrics.jsonl"
        p.write_text('{"step": 1}\n')
        size, age, elapsed = observe(p, started_at=time.time() - 5.0)
        assert size > 0 and age is not None and age < 30.0


class TestWatchLoop:
    """End-to-end supervisor on real (tiny) processes."""

    def test_clean_exit_returns_zero(self, tmp_path):
        proc = subprocess.Popen([sys.executable, "-c", "pass"])
        rc = watch(proc.pid, tmp_path / "m.jsonl",
                   WatchdogPolicy(stale_s=5.0, empty_limit_s=5.0),
                   poll_s=0.2, kill_grace_s=0.2)
        proc.wait()
        assert rc == 0

    def test_wedged_empty_log_killed_with_97(self, tmp_path):
        proc = subprocess.Popen([sys.executable, "-c",
                                 "import time; time.sleep(60)"])
        t0 = time.time()
        rc = watch(proc.pid, tmp_path / "m.jsonl",
                   WatchdogPolicy(stale_s=60.0, empty_limit_s=1.0),
                   poll_s=0.2, kill_grace_s=0.2)
        proc.wait()
        assert rc == 97
        assert time.time() - t0 < 30.0

    def test_wedged_stale_log_killed_with_97(self, tmp_path):
        log = tmp_path / "m.jsonl"
        log.write_text('{"step": 1}\n')
        old = time.time() - 3600.0
        os.utime(log, (old, old))
        proc = subprocess.Popen([sys.executable, "-c",
                                 "import time; time.sleep(60)"])
        rc = watch(proc.pid, log,
                   WatchdogPolicy(stale_s=5.0, empty_limit_s=600.0),
                   poll_s=0.2, kill_grace_s=0.2)
        proc.wait()
        assert rc == 97
