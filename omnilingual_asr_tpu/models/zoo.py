"""Model zoo: named configurations and checkpoint save/load.

The reference has no model state at all (weights live behind the Gemini API);
here checkpoints are Orbax-backed param pytrees (SURVEY §5 checkpoint row).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

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


def concrete_restore_template(template):
    """Annotate an abstract (``jax.eval_shape``) template with a concrete
    single-device sharding for Orbax restore.

    Without a sharding on the template leaves, Orbax falls back to the
    sharding recorded at *save* time, which names devices of the saving
    backend — a trunk seeded on CPU (``TFRT_CPU_0``) then fails to restore
    on the TPU backend and vice versa. Pinning the current backend's
    device 0 makes checkpoints portable across backends.
    """
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    return jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=sharding),
        template)


def load_checkpoint(path: str | Path, cfg: PipelineConfig):
    """Load a param pytree saved by :func:`save_checkpoint` or
    :func:`save_release`.

    Restores against the abstract structure of a freshly-initialized model so
    dtypes/shapes are validated at load time.
    """
    path = Path(path).resolve()
    template = jax.eval_shape(lambda: asr_init(jax.random.PRNGKey(0), cfg))
    if path.suffix == ".npz":
        return load_release(path, template)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, concrete_restore_template(template))


# ---------------------------------------------------------------------------
# Release format: one float16 .npz per model. Orbax stays the training
# format (atomic, resumable, full precision); this is the *shipping* format —
# half the bytes, a single file, loadable with numpy alone. float16 holds
# ~3 decimal digits of mantissa, well inside what bfloat16 inference
# (EncoderConfig.dtype) can distinguish, so serving output is unaffected.


def save_release(path: str | Path, params) -> None:
    """Write a param pytree as a single float16 ``.npz`` file."""
    import numpy as np

    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    flat = {}
    for keypath, leaf in leaves:
        x = np.asarray(leaf)
        if np.issubdtype(x.dtype, np.floating):
            x = x.astype(np.float16)
        flat[jax.tree_util.keystr(keypath)] = x
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    import io

    buf = io.BytesIO()
    np.savez(buf, **flat)
    path.write_bytes(buf.getvalue())


def load_release(path: str | Path, template):
    """Load a ``.npz`` written by :func:`save_release` against an abstract
    template pytree (from ``jax.eval_shape`` on the matching init)."""
    import numpy as np

    with np.load(Path(path)) as z:
        data = {k: z[k] for k in z.files}

    def restore(keypath, leaf):
        key = jax.tree_util.keystr(keypath)
        if key not in data:
            raise KeyError(f"release checkpoint {path} is missing {key}")
        x = data[key]
        if x.shape != tuple(leaf.shape):
            raise ValueError(
                f"release checkpoint {path}: {key} has shape {x.shape}, "
                f"model expects {tuple(leaf.shape)}")
        return x.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(restore, template)


def default_release_dir() -> Optional[Path]:
    """The in-repo shipped-checkpoint directory, if present.

    Resolution order: ``$OMNIASR_RELEASE_DIR``, then ``checkpoints/release``
    next to the package (the repo layout). Returns None when neither exists —
    e.g. a bare pip install — so callers fall back to random init exactly as
    before a checkpoint was shipped.
    """
    env = os.getenv("OMNIASR_RELEASE_DIR")
    if env is not None:
        p = Path(env)
        return p if env and p.is_dir() else None
    repo = Path(__file__).resolve().parent.parent.parent
    p = repo / "checkpoints" / "release"
    return p if p.is_dir() else None
