"""Fused log-mel frontend kernel (Pallas/TPU).

Replaces the reference's delegation of feature extraction to ffmpeg + the
Gemini service (reference gemini_pipeline.py:273-301 and the remote call at
:512-530) with a single on-chip kernel:

    frames @ (win*cos DFT) -> Re
    frames @ (win*sin DFT) -> Im        } three MXU matmuls + VPU epilogue,
    (Re^2 + Im^2) @ mel_fb -> mel       } one HBM round-trip total
    log(max(mel, floor))

Design notes (TPU-first):
- The rFFT is expressed as two dense [n_fft, n_freqs] matmuls instead of a
  butterfly FFT: at n_fft=512 this is ~0.5 MFLOP/frame of pure MXU work and
  fuses with the mel projection, where a radix-2 FFT would serialize on the
  VPU (the browser reference uses recursive Cooley-Tukey,
  public/static/app.js:2762-2798 — exactly what NOT to do on a systolic
  array).
- The Hann window is folded into the DFT matrices (diag(win) @ DFT), so the
  kernel body is matmul-only.
- The frequency axis (257 bins) is zero-padded to 384 = 3*128 lanes; the
  padded mel filterbank rows are zero so the padding contributes nothing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio.frontend import dft_matrices, hann_window, mel_filterbank, preemphasis
from ..config import FrontendConfig

BLOCK_T = 256          # frames per grid step
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_mel_constants(cfg: FrontendConfig):
    """Precompute the (windowed) DFT and mel matrices, lane-padded.

    Returns (cw, sw, fb_pad):
      cw, sw: [n_fft, n_freqs_pad]  windowed cos/sin DFT
      fb_pad: [n_freqs_pad, n_mels]
    """
    cos_m, sin_m = dft_matrices(cfg)
    win = np.zeros(cfg.n_fft, dtype=np.float32)
    win[: cfg.win_length] = hann_window(cfg.win_length)
    cw = win[:, None] * cos_m
    sw = win[:, None] * sin_m
    n_freqs_pad = _round_up(cfg.n_freqs, LANE)
    pad = n_freqs_pad - cfg.n_freqs
    cw = np.pad(cw, ((0, 0), (0, pad)))
    sw = np.pad(sw, ((0, 0), (0, pad)))
    fb = np.pad(mel_filterbank(cfg), ((0, pad), (0, 0)))
    return cw, sw, fb


def _mel_kernel(log_floor, f_ref, c_ref, s_ref, fb_ref, out_ref):
    # precision=HIGHEST: the DFT needs true f32 accumulation (default
    # precision runs bf16 MXU passes, a ~-35 dB noise floor; HIGHEST keeps
    # the feature noise floor below -100 dB at negligible frontend cost).
    hi = jax.lax.Precision.HIGHEST
    f = f_ref[:]
    re = jnp.dot(f, c_ref[:], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(f, s_ref[:], preferred_element_type=jnp.float32, precision=hi)
    power = re * re + im * im
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    out_ref[:] = jnp.log(jnp.maximum(mel, log_floor))


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def log_mel_frames_pallas(frames: jnp.ndarray, cw: jnp.ndarray, sw: jnp.ndarray,
                          fb: jnp.ndarray, cfg: FrontendConfig,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused log-mel over pre-cut frames.

    frames: [T, n_fft] raw (unwindowed) frames, T padded to BLOCK_T.
    Returns [T, n_mels] float32 log-mel.
    """
    T, n_fft = frames.shape
    assert n_fft == cfg.n_fft, (n_fft, cfg.n_fft)
    assert T % BLOCK_T == 0, f"T={T} must be padded to a multiple of {BLOCK_T}"
    n_freqs_pad = cw.shape[1]
    grid = (T // BLOCK_T,)
    kernel = partial(_mel_kernel, cfg.log_floor)
    flops_per_block = 2 * BLOCK_T * n_freqs_pad * (2 * n_fft + cfg.n_mels)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_T, n_fft), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freqs_pad, cfg.n_mels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_T, cfg.n_mels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, cfg.n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_block * grid[0],
            bytes_accessed=frames.size * 4 + T * cfg.n_mels * 4,
            transcendentals=T * cfg.n_mels,
        ),
        interpret=interpret,
    )(frames, cw, sw, fb)


class MelFrontend:
    """Stateful convenience wrapper: holds device-resident constants and cuts
    frames so callers go straight from raw samples to log-mel.

    The full-FFT-length framing trick: frames are cut at length n_fft (not
    win_length) and the zero tail of the folded window kills the extra
    samples, so the result is bit-identical to window-then-zero-pad.
    """

    def __init__(self, cfg: FrontendConfig, interpret: bool | None = None):
        self.cfg = cfg
        cw, sw, fb = build_mel_constants(cfg)
        self.cw = jnp.asarray(cw)
        self.sw = jnp.asarray(sw)
        self.fb = jnp.asarray(fb)
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret

    def frames_from_signal(self, x: jnp.ndarray) -> tuple[jnp.ndarray, int]:
        """Pre-emphasis + strided framing at n_fft length, T padded to
        BLOCK_T. Returns (frames [T_pad, n_fft], true_n_frames)."""
        cfg = self.cfg
        x = preemphasis(x.astype(jnp.float32), cfg.preemphasis)
        n_frames = cfg.frames_for_samples(x.shape[0])
        if n_frames <= 0:
            return jnp.zeros((BLOCK_T, cfg.n_fft), jnp.float32), 0
        # Last frame starts at (n_frames-1)*hop and spans n_fft samples.
        need = (n_frames - 1) * cfg.hop_length + cfg.n_fft
        if need > x.shape[0]:
            x = jnp.pad(x, (0, need - x.shape[0]))
        idx = (
            jnp.arange(n_frames)[:, None] * cfg.hop_length
            + jnp.arange(cfg.n_fft)[None, :]
        )
        frames = x[idx]
        T_pad = _round_up(n_frames, BLOCK_T)
        if T_pad > n_frames:
            frames = jnp.pad(frames, ((0, T_pad - n_frames), (0, 0)))
        return frames, n_frames

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Raw samples [n] -> log-mel [n_frames, n_mels]."""
        frames, n_frames = self.frames_from_signal(x)
        mel = log_mel_frames_pallas(frames, self.cw, self.sw, self.fb,
                                    self.cfg, interpret=self.interpret)
        return mel[:n_frames]
