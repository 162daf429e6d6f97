"""Device mesh, shardings, and distributed strategies (DP/TP/PP/SP/EP)."""

from .mesh import build_mesh, init_distributed, shard_params  # noqa: F401
