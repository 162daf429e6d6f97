"""Tracing utility tests."""

import json
import logging
import time

from omnilingual_asr_tpu.utils.tracing import StageTrace, device_trace, log_event


class TestStageTrace:
    def test_stages_and_rates(self):
        tr = StageTrace(n_chips=4)
        with tr.stage("decode"):
            time.sleep(0.01)
        with tr.stage("forward"):
            time.sleep(0.02)
        tr.audio_seconds = 120.0
        d = tr.to_dict()
        assert set(d["stages"]) == {"decode", "forward"}
        assert d["total_seconds"] >= 0.03
        assert d["rtf"] > 0
        # audio-h/min/chip = (120/3600) / (t/60) / 4
        expect = (120 / 3600) / (d["total_seconds"] / 60) / 4
        assert abs(d["audio_hours_per_min_per_chip"] - expect) < 1e-9

    def test_stage_accumulates(self):
        tr = StageTrace()
        for _ in range(3):
            with tr.stage("x"):
                pass
        assert len(tr.stages) == 1

    def test_zero_division_safe(self):
        tr = StageTrace()
        assert tr.rtf == 0.0
        assert tr.audio_hours_per_min_per_chip == 0.0

    def test_log_event_json(self, caplog):
        with caplog.at_level(logging.INFO, logger="omniasr"):
            log_event("test_event", value=42)
        rec = json.loads(caplog.records[-1].message)
        assert rec == {"event": "test_event", "value": 42}

    def test_device_trace_noop(self):
        with device_trace(None):
            pass  # no log dir: must be a no-op
