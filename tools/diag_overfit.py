"""Diagnostic: can a given config memorize a FIXED synth set?

Separates "model/optimization bug at scale" from "stream too hard":
draws K batches from the SynthBatcher once, then cycles them forever.
If CTC -> ~0 the model+step are fine and the live-stream runs need
data/schedule fixes; if CTC stays at the unigram-prior level (~3 nats/byte)
the bug is in the model/loss at this scale.

    python -m tools.diag_overfit --d-model 512 --n-layers 12 \
        --steps 1000 --lr 1e-3 --no-augment --ctc-only
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from omnilingual_asr_tpu.config import MeshConfig, PipelineConfig
from omnilingual_asr_tpu.parallel.mesh import build_mesh
from omnilingual_asr_tpu.train.augment import SpecAugmentConfig
from omnilingual_asr_tpu.train.step import make_optimizer, make_train_step
from omnilingual_asr_tpu.train.synth import SynthBatcher

LEGACY = ("samples", "mask", "labels", "label_mask", "lid_label",
          "emotion_label")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d-model", type=int, default=512)
    ap.add_argument("--n-layers", type=int, default=12)
    ap.add_argument("--n-heads", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--n-batches", type=int, default=16,
                    help="fixed dataset = n_batches x batch_size examples")
    ap.add_argument("--window-seconds", type=float, default=8.0)
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument("--ctc-only", action="store_true",
                    help="legacy keys only: no speaker/translation losses")
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = PipelineConfig()
    cfg = cfg.replace(
        encoder=dataclasses.replace(cfg.encoder, d_model=args.d_model,
                                    n_layers=args.n_layers,
                                    n_heads=args.n_heads),
        mesh=MeshConfig(data=-1, model=1))
    mesh = build_mesh(cfg.mesh)

    batcher = SynthBatcher(cfg, batch_size=args.batch_size,
                           window_seconds=args.window_seconds,
                           seed=args.seed, n_threads=1)
    fixed = []
    it = iter(batcher)
    for _ in range(args.n_batches):
        b = next(it)
        if args.ctc_only:
            b = {k: b[k] for k in LEGACY}
        fixed.append({k: jnp.asarray(v) for k, v in b.items()})
    batcher.close()
    keys = tuple(fixed[0].keys())
    print(f"fixed set: {args.n_batches} x {args.batch_size} examples, "
          f"keys={keys}", flush=True)

    augment = None if args.no_augment else SpecAugmentConfig(
        n_freq_masks=1, freq_mask_width=16, n_time_masks=1,
        time_mask_width=24)
    init_state, train_step = make_train_step(
        cfg, mesh,
        tx=make_optimizer(lr=args.lr, warmup_steps=args.warmup,
                          decay_steps=max(args.steps, args.warmup + 1)),
        from_samples=True, batch_keys=keys,
        with_translator=not args.ctc_only, augment=augment)
    state = init_state(seed=args.seed)
    params, opt_state, step = state.params, state.opt_state, state.step

    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, step, metrics = train_step(
            params, opt_state, fixed[i % len(fixed)], step)
        if (i + 1) % args.log_every == 0 or i == 0:
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            print(json.dumps({"step": i + 1, **m,
                              "steps_per_s": round((i + 1) / (
                                  time.perf_counter() - t0), 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
