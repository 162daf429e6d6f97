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
                   warmup_steps: int = 1000) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
        decay_steps=200_000, end_value=lr * 0.05)
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=weight_decay),
    )


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def loss_fn(params, batch: Dict[str, jnp.ndarray], cfg: PipelineConfig):
    """Joint loss: CTC + 0.1*(LID CE + emotion CE).

    batch keys: mel [B,T,F], mask [B,T], labels [B,L], label_mask [B,L],
    lid_label [B], emotion_label [B].
    """
    out = asr_forward(params, batch["mel"], batch["mask"], cfg)
    l_ctc = ctc_loss(out["ctc_logits"], out["mask"], batch["labels"],
                     batch["label_mask"], blank_id=cfg.vocab.blank_id)

    sub_mask = out["mask"].astype(jnp.float32)[:, :, None]
    denom = jnp.maximum(sub_mask.sum(axis=1), 1.0)

    def pooled_ce(logits, label):
        pooled = (logits * sub_mask).sum(axis=1) / denom
        logp = jax.nn.log_softmax(pooled, axis=-1)
        return -jnp.take_along_axis(logp, label[:, None], axis=-1).mean()

    l_lid = pooled_ce(out["lid_logits"], batch["lid_label"])
    l_emo = pooled_ce(out["emotion_logits"], batch["emotion_label"])
    total = l_ctc + 0.1 * (l_lid + l_emo)
    return total, {"loss": total, "ctc": l_ctc, "lid": l_lid, "emotion": l_emo}


def batch_specs() -> Dict[str, P]:
    return {
        "mel": P("data", None, None),
        "mask": P("data", None),
        "labels": P("data", None),
        "label_mask": P("data", None),
        "lid_label": P("data"),
        "emotion_label": P("data"),
    }


def make_train_step(cfg: PipelineConfig, mesh: Mesh,
                    tx: Optional[optax.GradientTransformation] = None,
                    from_samples: bool = False,
                    augment: Optional["SpecAugmentConfig"] = None):
    """Returns (init_state_fn, train_step_fn), both jitted over the mesh.

    GSPMD propagates param shardings into the optimizer state, so only
    params and batch are explicitly annotated.

    from_samples=True: the batch carries raw ``samples`` [B, n] instead of
    ``mel`` and the log-mel frontend runs inside the same jit (fused with
    the step, matching the inference engine's fused pipeline).
    """
    tx = tx or make_optimizer()
    pspecs = asr_param_specs(cfg)
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                            is_leaf=lambda x: isinstance(x, P))
    bspecs = batch_specs()
    if from_samples:
        bspecs = dict(bspecs)
        del bspecs["mel"]
        bspecs["samples"] = P("data", None)
    batch_sh = {k: NamedSharding(mesh, s) for k, s in bspecs.items()}

    frontend = None
    if from_samples:
        from ..ops.mel_pallas import MelFrontend

        frontend = MelFrontend(cfg.frontend)

    def init_state(seed: int = 0) -> TrainState:
        params = asr_init(jax.random.PRNGKey(seed), cfg)
        params = shard_params(params, pspecs, mesh)
        opt_state = jax.jit(tx.init)(params)
        return TrainState(params=params, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32))

    def _with_mel(batch):
        if not from_samples:
            return batch
        samples = batch["samples"]
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

    @partial(jax.jit, donate_argnums=(0, 1),
             in_shardings=(param_sh, None, batch_sh, None))
    def train_step(params, opt_state, batch, step):
        batch = _with_mel(batch)
        if augment is not None:
            from .augment import spec_augment

            key = jax.random.fold_in(jax.random.PRNGKey(0), step)
            batch = dict(batch)
            batch["mel"] = spec_augment(key, batch["mel"], batch["mask"],
                                        augment)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, cfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, step + 1, metrics

    return init_state, train_step
