"""Multi-task training step under pjit.

The reference ships no training at all (SURVEY §0); this module provides the
full TPU-native training path for the framework's models: CTC over byte
labels plus cross-entropy for the LID and emotion heads, AdamW, gradients
data-parallel over the mesh 'data' axis and params/optimizer state tensor-
parallel over 'model' — all sharding via NamedSharding + GSPMD-propagated
collectives (no hand-written NCCL/MPI equivalents needed).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PipelineConfig
from ..models.conformer import asr_forward, asr_init, asr_param_specs
from ..ops.ctc import ctc_loss
from ..parallel.mesh import shard_params


def make_optimizer(lr: float = 1e-3, weight_decay: float = 1e-6,
                   warmup_steps: int = 1000,
                   decay_steps: int = 200_000) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
        decay_steps=decay_steps, end_value=lr * 0.05)
    return optax.chain(
        # A non-finite gradient from one pathological batch must cost one
        # (skipped) update, not the run. Order matters: a NaN/inf anywhere
        # makes the global norm non-finite, so the clip turns EVERY leaf
        # NaN — and zero_nans after it then zeroes the whole update.
        optax.clip_by_global_norm(1.0),
        optax.zero_nans(),
        optax.adamw(sched, weight_decay=weight_decay),
    )


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def aam_softmax_loss(embed: jnp.ndarray, labels: jnp.ndarray,
                     weight: jnp.ndarray, margin: float = 0.2,
                     scale: float = 30.0) -> jnp.ndarray:
    """Additive-angular-margin softmax (ArcFace) over speaker classes.

    embed: [B, D] L2-normalized; weight: [D, C]; labels: [B] int."""
    wn = weight / jnp.maximum(
        jnp.linalg.norm(weight, axis=0, keepdims=True), 1e-8)
    cos = embed @ wn                       # [B, C]
    tgt = jnp.take_along_axis(cos, labels[:, None], axis=1)[:, 0]
    # Clamp away from ±1 BEFORE the sqrt: d/dx sqrt(1-x²) → ∞ at |x|=1,
    # and once the embeddings sharpen a single example hitting cos=1.0
    # sends an inf gradient through clip_by_global_norm → NaN params
    # (observed: run r3_d256x4b diverged in one step at speaker-loss 6.1,
    # its sharpest point, after 1850 healthy steps).
    tgt = jnp.clip(tgt, -1.0 + 1e-4, 1.0 - 1e-4)
    sin = jnp.sqrt(1.0 - tgt ** 2)
    tgt_m = tgt * jnp.cos(margin) - sin * jnp.sin(margin)
    onehot = jax.nn.one_hot(labels, cos.shape[-1], dtype=cos.dtype)
    logits = scale * (cos + onehot * (tgt_m - tgt)[:, None])
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -(logp * onehot).sum(axis=-1).mean()


def loss_fn(params, batch: Dict[str, jnp.ndarray], cfg: PipelineConfig,
            trans_params=None, dropout_rng=None):
    """Joint multi-task loss.

    Always: CTC + 0.1*(LID CE + emotion CE).
    Optional (keyed by batch contents):
      lid_frame_label [B,T'] (-1 = unlabeled) -> frame-level LID CE (enables
          code-switch detection) instead of pooled LID;
      speaker_label [B] -> AAM-softmax on the stats-pooled speaker embedding
          (x-vector recipe);
      trans_in/trans_tgt/trans_mask [B,Lt] + trans_params -> teacher-forced
          X->English translation CE over the shared encoder states.
    """
    out = asr_forward(params, batch["mel"], batch["mask"], cfg,
                      dropout_rng=dropout_rng)
    l_ctc_seq = ctc_loss(out["ctc_logits"], out["mask"], batch["labels"],
                         batch["label_mask"], blank_id=cfg.vocab.blank_id)
    # Normalize CTC to PER-LABEL-TOKEN nats: the per-sequence sum is ~40x
    # larger than every other objective, so its gradient drowns the dense
    # frame-CE bootstrap and the aux heads (observed: frame CE driven above
    # uniform). Per-token, all losses are O(1-5) and coexist; the global-
    # norm clip keeps update magnitudes unchanged.
    n_seq = jnp.maximum(batch["label_mask"].any(axis=-1).sum(), 1)
    n_tok = jnp.maximum(batch["label_mask"].sum(), 1)
    l_ctc = l_ctc_seq * n_seq / n_tok
    # w_ctc (curriculum scalar): ramps CTC in while the frame-CE bootstrap
    # establishes the char acoustics.
    w_ctc = batch.get("w_ctc", 1.0)

    sub_mask = out["mask"].astype(jnp.float32)[:, :, None]
    denom = jnp.maximum(sub_mask.sum(axis=1), 1.0)

    def pooled_ce(logits, label):
        pooled = (logits * sub_mask).sum(axis=1) / denom
        logp = jax.nn.log_softmax(pooled, axis=-1)
        return -jnp.take_along_axis(logp, label[:, None], axis=-1).mean()

    if "lid_frame_label" in batch:
        lbl = batch["lid_frame_label"]
        valid = (lbl >= 0) & out["mask"]
        logp = jax.nn.log_softmax(out["lid_logits"], axis=-1)
        pick = jnp.take_along_axis(
            logp, jnp.maximum(lbl, 0)[:, :, None], axis=-1)[:, :, 0]
        l_lid = -(pick * valid).sum() / jnp.maximum(valid.sum(), 1.0)
    else:
        l_lid = pooled_ce(out["lid_logits"], batch["lid_label"])
    l_emo = pooled_ce(out["emotion_logits"], batch["emotion_label"])
    total = w_ctc * l_ctc + 0.1 * (l_lid + l_emo)
    metrics = {"ctc": l_ctc, "lid": l_lid, "emotion": l_emo}

    if "char_frame_label" in batch:
        # Dense per-frame byte CE from the synthesizer's exact char spans:
        # supervises the char->acoustics mapping WITHOUT the alignment
        # search, bootstrapping CTC past the "unigram prior plateau".
        # Crucially it is computed on the BLANK-EXCLUDED renormalized
        # distribution p(byte | not blank): CTC keeps free rein over blank
        # mass (its early gradient pushes blank everywhere) while frame CE
        # shapes the relative byte geometry — the two objectives no longer
        # fight over the same softmax (observed stalemate otherwise).
        assert cfg.vocab.blank_id == 0
        n_real = 1 + cfg.vocab.n_bytes
        lbl = batch["char_frame_label"]
        valid = (lbl >= 0) & out["mask"]
        logp_f = jax.nn.log_softmax(
            out["ctc_logits"][..., 1:n_real], axis=-1)
        pick_f = jnp.take_along_axis(
            logp_f, jnp.maximum(lbl - 1, 0)[:, :, None], axis=-1)[:, :, 0]
        l_fce = -(pick_f * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        total = total + batch.get("w_fce", 1.0) * l_fce
        metrics["frame_ce"] = l_fce

    if cfg.encoder.n_experts > 0:
        # Switch-style load-balance aux (summed over blocks in asr_forward);
        # 0.01 is the standard coefficient (Fedus et al.).
        total = total + 0.01 * out["moe_aux"]
        metrics["moe_aux"] = out["moe_aux"]

    if "speaker_label" in batch:
        from ..models.conformer import pooled_speaker_embed

        emb = pooled_speaker_embed(params, out["speaker_frames"],
                                   out["mask"].astype(jnp.float32))
        l_spk = aam_softmax_loss(emb, batch["speaker_label"],
                                 params["spk_aam"])
        total = total + 0.3 * batch.get("w_spk", 1.0) * l_spk
        metrics["speaker"] = l_spk

    if trans_params is not None and "trans_in" in batch:
        from ..models.translation import decoder_forward

        tlogits = decoder_forward(trans_params, batch["trans_in"],
                                  out["encoder_states"], out["mask"], cfg)
        tlogp = jax.nn.log_softmax(tlogits, axis=-1)
        pick = jnp.take_along_axis(
            tlogp, batch["trans_tgt"][:, :, None], axis=-1)[:, :, 0]
        tm = batch["trans_mask"].astype(jnp.float32)
        l_tr = -(pick * tm).sum() / jnp.maximum(tm.sum(), 1.0)
        total = total + 0.5 * batch.get("w_trans", 1.0) * l_tr
        metrics["translation"] = l_tr

    metrics["loss"] = total
    return total, metrics


#: PartitionSpec per known batch key (batch dim over 'data').
_BATCH_KEY_SPECS: Dict[str, P] = {
    "mel": P("data", None, None),
    "samples": P("data", None),
    "mask": P("data", None),
    "labels": P("data", None),
    "label_mask": P("data", None),
    "lid_label": P("data"),
    "emotion_label": P("data"),
    "speaker_label": P("data"),
    "lid_frame_label": P("data", None),
    "char_frame_label": P("data", None),
    "trans_in": P("data", None),
    "trans_tgt": P("data", None),
    "trans_mask": P("data", None),
    # per-step loss-ramp scalars (replicated): curriculum training turns
    # auxiliary losses/augmentation on mid-run without recompiling
    "w_spk": P(),
    "w_trans": P(),
    "w_aug": P(),
    "w_fce": P(),
    "w_ctc": P(),
}

_LEGACY_KEYS = ("mel", "mask", "labels", "label_mask", "lid_label",
                "emotion_label")


def batch_specs() -> Dict[str, P]:
    return {k: _BATCH_KEY_SPECS[k] for k in _LEGACY_KEYS}


def _mel_from_samples(batch, cfg: PipelineConfig, frontend):
    """Decode the sample wire format and run the fused log-mel frontend
    inside the step's jit (shared by the batch and pool train paths)."""
    samples = batch["samples"]
    if samples.dtype == jnp.int16:
        # i16 wire format: half the H2D bytes of f32 (the tunnel/PCIe
        # transfer bounds steps/s on link-attached hosts), lossless for
        # 16-bit audio sources — same trick as the serving engine.
        samples = samples.astype(jnp.float32) * (1.0 / 32768.0)
    elif samples.dtype == jnp.uint8:
        # μ-law wire (audio/codec.py): half of i16 again at ~38 dB SNR
        # — below the training noise augmentation floor, so gradient
        # quality is unaffected while H2D-bound steps/s nearly double.
        from ..audio.codec import mulaw_decode

        samples = mulaw_decode(samples)
    T = batch["mask"].shape[1]

    def frames_one(x):
        return frontend.frames_from_signal(x)[0]

    from ..ops.mel_pallas import log_mel_frames_pallas

    frames = jax.vmap(frames_one)(samples)
    B, T_pad, n_fft = frames.shape
    mel = log_mel_frames_pallas(
        frames.reshape(B * T_pad, n_fft), frontend.cw, frontend.sw,
        frontend.fb, cfg.frontend, interpret=frontend.interpret)
    mel = mel.reshape(B, T_pad, -1)[:, :T]
    out = dict(batch)
    out.pop("samples")
    out["mel"] = mel
    return out


def make_train_step(cfg: PipelineConfig, mesh: Mesh,
                    tx: Optional[optax.GradientTransformation] = None,
                    from_samples: bool = False,
                    augment: Optional["SpecAugmentConfig"] = None,
                    batch_keys=None,
                    with_translator: bool = False,
                    dropout: bool = False):
    """Returns (init_state_fn, train_step_fn), both jitted over the mesh.

    GSPMD propagates param shardings into the optimizer state, so only
    params and batch are explicitly annotated.

    from_samples=True: the batch carries raw ``samples`` [B, n] instead of
    ``mel`` and the log-mel frontend runs inside the same jit (fused with
    the step, matching the inference engine's fused pipeline).

    batch_keys: the batch dict's keys (defaults to the legacy 6-key set);
    extra keys (speaker_label, lid_frame_label, trans_*) switch on the
    corresponding losses in loss_fn.

    with_translator=True: params become {"asr":…, "translator":…} and the
    X->English decoder trains jointly through the shared encoder states.
    """
    tx = tx or make_optimizer()
    pspecs = asr_param_specs(cfg)
    if with_translator:
        from ..models.translation import translator_specs

        pspecs = {"asr": pspecs, "translator": translator_specs()}
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                            is_leaf=lambda x: isinstance(x, P))
    if batch_keys is None:
        keys = list(_LEGACY_KEYS)
        if from_samples:
            keys[keys.index("mel")] = "samples"
    else:
        keys = list(batch_keys)
    bspecs = {k: _BATCH_KEY_SPECS[k] for k in keys}
    batch_sh = {k: NamedSharding(mesh, s) for k, s in bspecs.items()}

    frontend = None
    if from_samples:
        from ..ops.mel_pallas import MelFrontend

        frontend = MelFrontend(cfg.frontend)

    def init_state(seed: int = 0) -> TrainState:
        params = asr_init(jax.random.PRNGKey(seed), cfg)
        if with_translator:
            from ..models.translation import translator_init

            params = {"asr": params,
                      "translator": translator_init(
                          jax.random.PRNGKey(seed + 1), cfg)}
        params = shard_params(params, pspecs, mesh)
        opt_state = jax.jit(tx.init)(params)
        return TrainState(params=params, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32))

    def _with_mel(batch):
        if not from_samples:
            return batch
        return _mel_from_samples(batch, cfg, frontend)

    @partial(jax.jit, donate_argnums=(0, 1),
             in_shardings=(param_sh, None, batch_sh, None))
    def train_step(params, opt_state, batch, step):
        batch = _with_mel(batch)
        if augment is not None:
            from .augment import spec_augment

            key = jax.random.fold_in(jax.random.PRNGKey(0), step)
            batch = dict(batch)
            aug = spec_augment(key, batch["mel"], batch["mask"], augment)
            # w_aug (curriculum ramp scalar) blends augmentation in without
            # recompiling; absent key = fully on
            w = batch.get("w_aug", 1.0)
            batch["mel"] = batch["mel"] + w * (aug - batch["mel"])
        dkey = (jax.random.fold_in(jax.random.PRNGKey(1), step)
                if dropout else None)
        if with_translator:
            def joint_loss(p, b):
                return loss_fn(p["asr"], b, cfg, trans_params=p["translator"],
                               dropout_rng=dkey)
        else:
            def joint_loss(p, b):
                return loss_fn(p, b, cfg, dropout_rng=dkey)
        (_, metrics), grads = jax.value_and_grad(
            joint_loss, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, step + 1, metrics

    return init_state, train_step
