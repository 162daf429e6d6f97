"""Device mesh construction and sharding helpers.

This is the framework's distributed-communication backend: where the
reference's only "backend" is HTTPS to Gemini (reference _gemini.js:149-156)
and its parallelism is a 4-thread pool over API calls
(gemini_pipeline.py:219,623), here chunks shard over the 'data' mesh axis and
tensors over 'model', with XLA emitting the collectives over ICI/DCN.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..config import MeshConfig

AXIS_DATA = "data"
AXIS_MODEL = "model"


def build_mesh(cfg: Optional[MeshConfig] = None,
               devices: Optional[list] = None) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices."""
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    data, model = cfg.resolve(n)
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (AXIS_DATA, AXIS_MODEL))


def shard_params(params, specs, mesh: Mesh):
    """Place a param pytree on the mesh per its PartitionSpec pytree."""
    def place(p, spec):
        return jax.device_put(p, NamedSharding(mesh, spec))
    return jax.tree.map(place, params, specs,
                        is_leaf=lambda x: isinstance(x, PartitionSpec))


def named(mesh: Mesh, spec: PartitionSpec) -> NamedSharding:
    return NamedSharding(mesh, spec)


def to_varying(x, axis: str):
    """Mark a replicated value as device-varying over ``axis`` inside
    shard_map (vma typing); no-op when already varying."""
    if axis in getattr(jax.typeof(x), "vma", ()):
        return x
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis, to="varying")
    return jax.lax.pvary(x, axis)
