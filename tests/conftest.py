"""Test configuration.

Tests run on a virtual 8-device CPU mesh so every sharding path (DP/TP/SP)
executes in CI without TPU hardware, per SURVEY.md §4. Must set XLA flags
before jax initializes.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's PYTHONPATH site hook pre-imports jax before conftest
# runs, so the env var alone is too late; the backend itself is still lazy,
# so forcing the platform through jax.config works as long as no devices
# have been touched yet.
# Hermetic: never auto-load the shipped release checkpoint in tests —
# engines built without explicit params must behave identically whether or
# not checkpoints/release exists (tests that cover discovery point
# OMNIASR_RELEASE_DIR at their own tmp dir).
os.environ.setdefault("OMNIASR_RELEASE_DIR", "")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: no persistent compilation cache for CPU tests — XLA:CPU AOT
# artifacts encode host CPU features and can SIGILL across machines.
# The TPU bench keeps its own cache (bench.py).

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = Path("/root/reference")


@pytest.fixture(scope="session")
def gettysburg_wav() -> Path:
    p = REFERENCE_DIR / "gettysburg.wav"
    if not p.exists():
        pytest.skip("gettysburg.wav asset unavailable")
    return p


@pytest.fixture(scope="session")
def lisu_mp3() -> Path:
    p = REFERENCE_DIR / "Samuel Speaking Lisu.mp3"
    if not p.exists():
        pytest.skip("Lisu mp3 asset unavailable")
    return p


@pytest.fixture
def rng():
    return np.random.default_rng(0)
