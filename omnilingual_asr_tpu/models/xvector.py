"""Standalone local-receptive-field speaker embedder (x-vector style).

Why a second network exists at all: the conformer trunk's speaker branch
taps the FINAL encoder layer, whose global self-attention freely mixes
information across the whole window. Trained on single-speaker windows,
nothing anchors per-frame speaker identity locally — and measured on
multi-speaker conversations the per-frame embeddings collapse (same/diff
speaker segment distances 0.085/0.055; tools/diag_diar.py). Production
diarization stacks pair the ASR model with a dedicated speaker embedder
for exactly this reason (SURVEY §2b diarization row: pyannote/DiariZen
designs from PAPERS.md).

This embedder is a small TDNN-style 1-D conv stack over log-mel with a
~0.5 s receptive field, so a frame's embedding CANNOT see another
speaker's turns by construction. It emits frame embeddings at the same
subsampled rate as the trunk (T/4), so the engine's per-segment pooling
(models/conformer.py pooled_speaker_embed_np) and AHC clustering work
unchanged — and because it runs on the mel the main forward already
computed, diarization costs no second pass and no extra H2D (unlike
speaker_mode="crop", which re-embeds every segment in isolation).

TPU notes: convs lower onto the MXU as [T, K*C] x [K*C, C'] matmuls via
XLA; everything is bf16 with static shapes, and the whole stack fuses
into the engine's single jitted program (engine.py process()).

Replaces: Gemini diarization, reference prompt requirement #1
(gemini_pipeline.py:204).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from . import layers as L
from .conformer import N_SPEAKER_CLASSES, SPK_DIM, _unit_columns

# (kernel, stride, dilation, out_channels) per conv layer. Two stride-2
# layers match the trunk's subsample_factor=4 frame rate; the dilated
# tail widens the receptive field to ~125 mel frames ~= 1.25 s. (The
# first 0.53 s-RF variant under-separated: in-engine same/diff-speaker
# distances 0.57/0.84 vs the trunk crop path's 0.03/0.54 — speaker
# identity in this voice space needs more temporal context than half a
# second, while staying far below a turn length so identity still
# cannot smear across speakers.)
_LAYERS = ((5, 2, 1, 128), (5, 2, 1, 256), (3, 1, 2, 256), (3, 1, 4, 256),
           (3, 1, 8, 256))


def xvector_init(key, cfg: PipelineConfig) -> Dict:
    n_in = cfg.frontend.n_mels
    keys = jax.random.split(key, len(_LAYERS) + 3)
    params: Dict = {"convs": [], "lns": []}
    c_in = n_in
    for i, (k, _, _, c_out) in enumerate(_LAYERS):
        # conv weight [K, Cin, Cout], fan-in scaled
        w = jax.random.normal(keys[i], (k, c_in, c_out), jnp.float32)
        w = w * (1.0 / np.sqrt(k * c_in))
        params["convs"].append({"w": w, "b": jnp.zeros((c_out,))})
        params["lns"].append(L.layernorm_init(c_out))
        c_in = c_out
    params["out"] = L.dense_init(keys[-3], c_in, SPK_DIM)
    # Same leaf names as the trunk's speaker pooling so the engine's host
    # twin (pooled_speaker_embed_np) applies unchanged.
    params["spk_proj"] = L.dense_init(keys[-2], 2 * SPK_DIM, SPK_DIM)
    params["aam"] = _unit_columns(keys[-1], (SPK_DIM, N_SPEAKER_CLASSES))
    return params


def xvector_frames(params, mel: jnp.ndarray, mask: jnp.ndarray,
                   dtype=jnp.bfloat16) -> jnp.ndarray:
    """[B, T, n_mels] log-mel -> [B, T//4, SPK_DIM] frame embeddings.

    mask: [B, T] bool over mel frames; invalid frames are zeroed on input
    (the conv's receptive field is local, so downstream masking of the
    pooled output handles the rest).
    """
    x = mel * mask[..., None]
    for conv, ln, (k, stride, dil, _) in zip(
            params["convs"], params["lns"], _LAYERS):
        x = jax.lax.conv_general_dilated(
            x.astype(dtype), conv["w"].astype(dtype),
            window_strides=(stride,), padding="SAME",
            rhs_dilation=(dil,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        x = x + conv["b"].astype(dtype)
        x = L.layernorm_apply(ln, x)
        x = jax.nn.relu(x)
    return L.dense_apply(params["out"], x, dtype).astype(jnp.float32)


def xvector_pooled(params, mel: jnp.ndarray, mask: jnp.ndarray,
                   dtype=jnp.bfloat16) -> jnp.ndarray:
    """Utterance-level L2-normalized embedding [B, SPK_DIM] (training path:
    stats pooling over valid subsampled frames + projection)."""
    frames = xvector_frames(params, mel, mask, dtype)
    sub = mask.shape[1] // frames.shape[1]
    m = mask.reshape(mask.shape[0], -1, sub).any(axis=-1)  # [B, T//4]
    w = m.astype(jnp.float32)
    n = jnp.maximum(w.sum(axis=1, keepdims=True), 1.0)
    mean = (frames * w[..., None]).sum(axis=1) / n
    var = ((frames - mean[:, None]) ** 2 * w[..., None]).sum(axis=1) / n
    pooled = jnp.concatenate([mean, jnp.sqrt(var + 1e-6)], axis=-1)
    e = L.dense_apply(params["spk_proj"], pooled, jnp.float32)
    return e * jax.lax.rsqrt(jnp.sum(e * e, axis=-1, keepdims=True) + 1e-8)


def xvector_param_specs(params) -> Dict:
    """All-replicated PartitionSpecs (the net is ~0.6 M params — sharding
    it would cost more in collectives than it saves)."""
    from jax.sharding import PartitionSpec as P

    return jax.tree.map(lambda _: P(), params)


def save_xvector(path, params) -> None:
    from .zoo import save_release

    save_release(path, params)


def load_xvector(path, cfg: PipelineConfig):
    """Load an xvector release .npz; raises KeyError/ValueError on a
    checkpoint that does not match this architecture."""
    from .zoo import load_release

    template = jax.eval_shape(
        lambda: xvector_init(jax.random.PRNGKey(0), cfg))
    return load_release(path, template)
