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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX (pod slices / DCN-spanning meshes).

    Single-host runs skip this entirely. On multi-host TPU pods, call once
    per process before building a mesh — afterwards `jax.devices()` spans
    all hosts and GSPMD routes intra-slice collectives over ICI and
    inter-slice over DCN automatically. Arguments default to the standard
    env vars (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID) and cloud
    TPU metadata when available.

    Returns True when distributed mode was initialized.
    """
    import os

    coordinator_address = coordinator_address or os.getenv(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None and os.getenv("TPU_WORKER_HOSTNAMES") is None:
        return False  # single-host
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None or os.getenv("NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes if num_processes is not None
            else os.environ["NUM_PROCESSES"])
    if process_id is not None or os.getenv("PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


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
