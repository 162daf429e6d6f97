"""Sample-wire codecs for host->device audio ingress.

The engine ships raw samples to the device inside one fused program
(engine.py process()); on tunnel/PCIe-attached hosts that H2D transfer —
not FLOPs — bounds end-to-end throughput. int16 ingress (lossless for
16-bit sources) is the default; μ-law companding (G.711's curve, mu=255)
halves the bytes again at ~38 dB SNR, which leaves log-mel features — and
downstream WER — essentially unchanged (eval_synth --ingress mulaw).

Both ends are ours, so the continuous companding formula is used rather
than the G.711 segment approximation; the pair below round-trips to the
quantization floor exactly.
"""

from __future__ import annotations

import numpy as np

MU = 255.0


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """f32 samples in [-1, 1] -> uint8 μ-law codes."""
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(MU * np.abs(x)) / np.log1p(MU)
    return np.round((y + 1.0) * 127.5).astype(np.uint8)


def mulaw_decode_np(u: np.ndarray) -> np.ndarray:
    """uint8 μ-law codes -> f32 samples (host reference for tests)."""
    y = u.astype(np.float32) / 127.5 - 1.0
    return np.sign(y) * (np.power(1.0 + MU, np.abs(y)) - 1.0) / MU


def mulaw_decode(u):
    """uint8 μ-law codes -> f32 samples, on-device (jax). Elementwise, so
    XLA fuses it straight into the mel frontend."""
    import jax.numpy as jnp

    y = u.astype(jnp.float32) / 127.5 - 1.0
    return jnp.sign(y) * (jnp.power(1.0 + MU, jnp.abs(y)) - 1.0) / MU
