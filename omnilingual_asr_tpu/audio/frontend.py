"""Log-mel feature frontend — reference (pure JAX/XLA) implementation.

The math follows the classic HTK mel pipeline and cross-checks against the
browser analyzer the reference ships (Hann window public/static/app.js:2807-2810,
mel scale :2875-2886, pre-emphasis :3092-3108):

    pre-emphasis -> Hann framing -> rFFT -> |.|^2 -> mel filterbank -> log

The hot fused version lives in ops/mel_pallas.py; this module is the
numerical ground truth the Pallas kernel is tested against, and also builds
the DFT/mel matrices that kernel consumes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FrontendConfig


def hz_to_mel(f):
    """HTK mel scale (matches the browser hzToMel, public app.js:2875-2880)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(cfg: FrontendConfig) -> np.ndarray:
    """Triangular mel filterbank matrix [n_freqs, n_mels], float32."""
    n_freqs = cfg.n_freqs
    fft_freqs = np.linspace(0.0, cfg.sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(hz_to_mel(cfg.f_min), hz_to_mel(cfg.fmax), cfg.n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_freqs, cfg.n_mels), dtype=np.float64)
    for m in range(cfg.n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-8)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-8)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (matches browser, public app.js:2807-2810)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def dft_matrices(cfg: FrontendConfig) -> tuple[np.ndarray, np.ndarray]:
    """Real-FFT as two dense matmuls: returns (cos, sin) of shape
    [n_fft, n_freqs] so that for a frame f (zero-padded to n_fft):
        Re = f @ cos,  Im = f @ sin,  power = Re^2 + Im^2.

    Dense DFT-by-matmul is the TPU-idiomatic choice: at n_fft=512 the matmul
    runs on the MXU and fuses with the mel projection, beating a butterfly
    FFT that would serialize on the VPU.
    """
    n_fft, n_freqs = cfg.n_fft, cfg.n_freqs
    k = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * f / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def frame_signal(x: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """Strided framing [n_samples] -> [n_frames, win_length] (center=False)."""
    n_frames = cfg.frames_for_samples(x.shape[0])
    if n_frames <= 0:
        return jnp.zeros((0, cfg.win_length), dtype=x.dtype)
    idx = (
        jnp.arange(n_frames)[:, None] * cfg.hop_length
        + jnp.arange(cfg.win_length)[None, :]
    )
    return x[idx]


def preemphasis(x: jnp.ndarray, coef: float) -> jnp.ndarray:
    """y[t] = x[t] - coef * x[t-1] (browser pre-emphasis, app.js:3092-3108)."""
    return jnp.concatenate([x[:1], x[1:] - coef * x[:-1]])


@partial(jax.jit, static_argnames=("cfg",))
def log_mel_jax(x: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """Ground-truth log-mel spectrogram [n_frames, n_mels] via jnp.fft.

    Used to validate the fused Pallas kernel and for CPU execution.
    """
    x = preemphasis(x.astype(jnp.float32), cfg.preemphasis)
    frames = frame_signal(x, cfg)
    win = jnp.asarray(hann_window(cfg.win_length))
    frames = frames * win[None, :]
    spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(mel_filterbank(cfg))
    mel = power @ fb
    return jnp.log(jnp.maximum(mel, cfg.log_floor))


def log_mel_frames_matmul(frames: jnp.ndarray, cfg: FrontendConfig,
                          cos_m: jnp.ndarray, sin_m: jnp.ndarray,
                          fb: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Matmul-form log-mel over pre-cut frames [T, win] -> [T, n_mels].

    This is the exact computation the Pallas kernel implements; kept in
    plain JAX so it can run anywhere and anchor kernel tests.
    """
    T = frames.shape[0]
    f = frames * win[None, :]
    pad = cfg.n_fft - cfg.win_length
    if pad > 0:
        f = jnp.pad(f, ((0, 0), (0, pad)))
    re = f @ cos_m
    im = f @ sin_m
    power = re * re + im * im
    mel = power @ fb
    return jnp.log(jnp.maximum(mel, cfg.log_floor))
