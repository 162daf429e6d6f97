"""Single-buffer device→host wire packing for head outputs.

Round-4 profiling (BENCH_r04 diag) put the end-to-end serving wall at the
host↔device link, not FLOPs: device-only RTF 7,120× vs 366.9× end-to-end,
with D2H at 12.4 MB/s over the tunnel. The engine's per-batch return is a
dict of 7+ small arrays, each pulled with its own transfer (per-transfer
round-trip latency + short-transfer bandwidth penalty, both brutal on a
network-tunneled chip).

This module flattens the whole output tree into ONE uint8 buffer on device
(bitcasts only — XLA fuses them into the final copy; no quality change) and
reconstructs the numpy dict from a static layout on host, so each batch
costs exactly one D2H round trip.

Layout is computed once per engine build from ``jax.eval_shape`` of the
unpacked function — no extra compile, no dynamic shapes on the wire.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["pack_tree", "layout_of", "unpack_buffer"]


def _as_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Flat uint8 view of an array (bitcast; bool stored as one byte)."""
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.uint8)
    if x.dtype != jnp.uint8:
        x = jax.lax.bitcast_convert_type(x, jnp.uint8)
    return x.reshape(-1)


def pack_tree(ret: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Concatenate every leaf (sorted by key) into one flat uint8 buffer.

    Must mirror :func:`layout_of` exactly — both iterate sorted(keys).
    """
    return jnp.concatenate([_as_u8(ret[k]) for k in sorted(ret)])


def layout_of(spec: Dict[str, Any]) -> List[Tuple[str, Any, Tuple[int, ...],
                                                  int, int]]:
    """[(name, numpy_dtype, shape, byte_offset, n_bytes)] for a dict of
    ShapeDtypeStructs (from jax.eval_shape) or arrays, in pack order."""
    out = []
    off = 0
    for k in sorted(spec):
        v = spec[k]
        dt = np.dtype(v.dtype)
        stored = np.dtype(np.uint8) if dt == np.bool_ else dt
        nb = int(np.prod(v.shape, dtype=np.int64)) * stored.itemsize
        out.append((k, dt, tuple(v.shape), off, nb))
        off += nb
    return out


def unpack_buffer(buf: np.ndarray, layout) -> Dict[str, np.ndarray]:
    """Rebuild the output dict from the packed buffer (zero-copy views
    where alignment allows; bools are re-widened from their byte form)."""
    buf = np.ascontiguousarray(buf)
    out: Dict[str, np.ndarray] = {}
    for name, dt, shape, off, nb in layout:
        raw = buf[off:off + nb]
        if dt == np.bool_:
            arr = raw.view(np.uint8).astype(np.bool_)
        else:
            arr = raw.view(dt)
        out[name] = arr.reshape(shape)
    return out
