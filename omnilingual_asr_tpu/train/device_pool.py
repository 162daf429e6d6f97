"""Device-resident example pool: near-zero per-step H2D training.

Motivation (measured, TRAINING_NOTES.md round 3): the axon tunnel's PJRT
client retains host transfer buffers ~1:1 with bytes shipped H2D and can
wedge mid-transfer, so shipping a full audio batch every step (~8 MB at
batch 64 i16) both leaks the host out of RAM by ~10k steps and caps
uninterrupted runs to short segments. The reference never faces this (its
compute is a remote API call, gemini_pipeline.py:512-530); a TPU-native
trainer can do better: keep the *dataset* in HBM.

Design:
  - the host bakes a pool of P collated examples ONCE (SynthBatcher in
    ``bake_mode``: expensive augments — speed/channel/LTAS EQ — applied,
    gain/noise left clean) and ships it to the device: ~1 GB at P=4096,
    8 s windows, i16;
  - every step ships only a [B] int32 index vector + the curriculum
    scalars. The train step gathers the batch rows, applies gain +
    additive-noise augmentation ON DEVICE (fresh realization per step,
    mirroring SynthBatcher._collate's host augmentation), then runs the
    usual fused mel -> conformer -> multi-task loss;
  - every ``refresh_every`` steps the host bakes one fresh batch and
    overwrites a rotating slice of the pool (donated dynamic_update_slice:
    no reallocation), so the pool churns completely every
    P/B * refresh_every steps and augmentation diversity is preserved.

Per-step H2D drops from ~8 MB to ~256 B (+ amortized refresh), removing
both the leak and most of the wedge exposure — the enabler for long
uninterrupted d512 runs (VERDICT r2 #1).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PipelineConfig
from ..models.conformer import asr_init, asr_param_specs
from ..parallel.mesh import shard_params
from .step import _BATCH_KEY_SPECS, TrainState, _mel_from_samples, loss_fn

__all__ = ["build_pool", "make_pool_train_step", "encode_wire"]


def encode_wire(samples: np.ndarray, wire: str) -> np.ndarray:
    """f32 [-1,1] -> pool storage dtype (i16 lossless-ish, mulaw half)."""
    if wire == "mulaw":
        from ..audio.codec import mulaw_encode

        return mulaw_encode(samples)
    return np.clip(samples * 32768.0, -32768, 32767).astype(np.int16)


def build_pool(batches: Iterator[Dict[str, np.ndarray]], n_entries: int,
               wire: str = "i16") -> Dict[str, np.ndarray]:
    """Concatenate bake-mode batches into host pool arrays [P, ...].

    ``batches`` must come from a SynthBatcher(bake_mode=True) so entries
    carry ``n_samples`` and un-noised audio.
    """
    parts: Dict[str, list] = {}
    n = 0
    while n < n_entries:
        b = next(batches)
        if "n_samples" not in b:
            raise ValueError("device pool requires bake_mode batches "
                             "(missing n_samples)")
        for k, v in b.items():
            parts.setdefault(k, []).append(v)
        n += len(b["n_samples"])
    pool = {k: np.concatenate(v)[:n_entries] for k, v in parts.items()}
    pool["samples"] = encode_wire(pool["samples"], wire)
    return pool


def make_pool_train_step(cfg: PipelineConfig, mesh: Mesh,
                         tx: Optional[optax.GradientTransformation] = None,
                         augment=None,
                         with_translator: bool = False,
                         snr_range: Optional[Tuple[float, float]]
                         = (15.0, 40.0),
                         gain_range: Tuple[float, float] = (0.7, 1.3),
                         dropout: bool = False):
    """Returns (init_state, pool_step, refresh_pool).

    pool_step(params, opt_state, pool, idx, step, scalars) — one training
    step on pool rows ``idx`` with fresh on-device gain/noise augmentation
    (disabled entirely when ``snr_range`` is None, e.g. for equivalence
    tests against the host-collated path).

    refresh_pool(pool, start, new) — donated in-place overwrite of pool
    rows [start:start+R) with a freshly baked slice.
    """
    from .step import make_optimizer

    tx = tx or make_optimizer()
    pspecs = asr_param_specs(cfg)
    if with_translator:
        from ..models.translation import translator_specs

        pspecs = {"asr": pspecs, "translator": translator_specs()}
    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                            is_leaf=lambda x: isinstance(x, P))
    repl = NamedSharding(mesh, P())

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

    def _augment_samples(x, n_valid, step):
        """On-device mirror of SynthBatcher._collate's per-draw noise:
        gain U(gain_range), then additive white noise at SNR U(snr_range)
        relative to the gained signal power, masked to the valid region,
        clipped. Fresh realization every step via the step-folded key."""
        B, W = x.shape
        key = jax.random.fold_in(jax.random.PRNGKey(17), step)
        kg, ks, kn = jax.random.split(key, 3)
        valid = (jnp.arange(W)[None, :] < n_valid[:, None]).astype(x.dtype)
        gain = jax.random.uniform(kg, (B, 1), x.dtype, *gain_range)
        x = x * gain
        p_sig = (x * x * valid).sum(axis=1, keepdims=True) \
            / jnp.maximum(n_valid[:, None].astype(x.dtype), 1.0) + 1e-12
        snr = jax.random.uniform(ks, (B, 1), x.dtype, *snr_range)
        noise = jax.random.normal(kn, (B, W), x.dtype) \
            * jnp.sqrt(p_sig / 10.0 ** (snr / 10.0))
        return jnp.clip(x + noise * valid, -1.0, 1.0)

    # idx/scalars replicated; pool replicated (single-chip: free; multi-
    # chip: the gathered batch is re-sharded onto the data axis below).
    @partial(jax.jit, donate_argnums=(0, 1),
             static_argnames=(),
             in_shardings=(param_sh, None, None, repl, None, None))
    def pool_step(params, opt_state, pool, idx, step, scalars):
        n_valid = pool["n_samples"][idx]
        batch = {k: v[idx] for k, v in pool.items() if k != "n_samples"}
        x = batch["samples"]
        if x.dtype == jnp.int16:
            x = x.astype(jnp.float32) * (1.0 / 32768.0)
        elif x.dtype == jnp.uint8:
            from ..audio.codec import mulaw_decode

            x = mulaw_decode(x)
        if snr_range is not None:
            x = _augment_samples(x, n_valid, step)
        batch["samples"] = x
        # GSPMD: pin the gathered batch onto the data axis so the mel +
        # model compute shards exactly like the host-batch path.
        batch = {k: jax.lax.with_sharding_constraint(
                     v, NamedSharding(mesh, _BATCH_KEY_SPECS[k]))
                 for k, v in batch.items()}
        batch.update(scalars)
        batch = _mel_from_samples(batch, cfg, frontend)
        if augment is not None:
            from .augment import spec_augment

            key = jax.random.fold_in(jax.random.PRNGKey(0), step)
            aug = spec_augment(key, batch["mel"], batch["mask"], augment)
            w = batch.get("w_aug", 1.0)
            batch["mel"] = batch["mel"] + w * (aug - batch["mel"])
        dkey = (jax.random.fold_in(jax.random.PRNGKey(1), step)
                if dropout else None)
        if with_translator:
            def joint_loss(p, b):
                return loss_fn(p["asr"], b, cfg,
                               trans_params=p["translator"],
                               dropout_rng=dkey)
        else:
            def joint_loss(p, b):
                return loss_fn(p, b, cfg, dropout_rng=dkey)
        (_, metrics), grads = jax.value_and_grad(
            joint_loss, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, step + 1, metrics

    @partial(jax.jit, donate_argnums=(0,))
    def refresh_pool(pool, start, new):
        return {
            k: jax.lax.dynamic_update_slice_in_dim(pool[k], new[k], start,
                                                   axis=0)
            for k in pool
        }

    return init_state, pool_step, refresh_pool
