"""Model zoo: named configurations and checkpoint save/load.

The reference has no model state at all (weights live behind the Gemini API);
here checkpoints are Orbax-backed param pytrees (SURVEY §5 checkpoint row).
"""

from __future__ import annotations

from pathlib import Path

import jax

from ..config import EncoderConfig, PipelineConfig
from .conformer import asr_init


def base_config() -> PipelineConfig:
    """~80M-param conformer: the default single-chip serving model."""
    return PipelineConfig()


def large_config() -> PipelineConfig:
    """~300M-param conformer for multi-chip tensor-parallel serving."""
    return PipelineConfig(encoder=EncoderConfig(
        d_model=1024, n_layers=16, n_heads=8, ffn_mult=4, conv_kernel=32))


def save_checkpoint(path: str | Path, params) -> None:
    """Save a param pytree with Orbax (atomic, versioned layout)."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str | Path, cfg: PipelineConfig):
    """Load a param pytree saved by :func:`save_checkpoint`.

    Restores against the abstract structure of a freshly-initialized model so
    dtypes/shapes are validated at load time.
    """
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    template = jax.eval_shape(lambda: asr_init(jax.random.PRNGKey(0), cfg))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
