"""Compatibility launcher mirroring the reference's server entry point
(reference workflows/wav2elan_web/app.py — `python workflows/wav2elan_web/
app.py` or an ASGI import). Starts the TPU-native server with the same
defaults: local mode, no auth, in-process engine.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from omnilingual_asr_tpu.serving.app import OmniServer, main  # noqa: E402,F401


def create_server(**kwargs) -> OmniServer:
    return OmniServer(**kwargs)


if __name__ == "__main__":
    main()
