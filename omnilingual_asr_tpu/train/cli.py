"""Training CLI: multi-task ASR training over a device mesh.

    python -m omnilingual_asr_tpu.train.cli manifest.jsonl \
        --steps 1000 --batch-size 32 --mesh-model 1 --ckpt out/ckpt

The reference trains nothing (all model capability is Gemini's); this is the
framework's path to producing the checkpoints the inference engine loads
(engine.py checkpoint_path / OMNIASR_CHECKPOINT).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MeshConfig, PipelineConfig, tiny_config
from ..models.zoo import save_checkpoint
from ..parallel.mesh import build_mesh
from .data import BatchLoader
from .step import make_optimizer, make_train_step


def train(manifest: str, *, steps: int, batch_size: int,
          cfg: PipelineConfig, lr: float = 1e-3,
          window_seconds: float = 15.0, ckpt: str | None = None,
          log_every: int = 10, seed: int = 0):
    mesh = build_mesh(cfg.mesh)
    loader = BatchLoader(manifest, cfg, batch_size=batch_size,
                         window_seconds=window_seconds, seed=seed)
    init_state, train_step = make_train_step(
        cfg, mesh, tx=make_optimizer(lr=lr), from_samples=True)
    state = init_state(seed=seed)
    params, opt_state, step = state.params, state.opt_state, state.step

    t0 = time.perf_counter()
    audio_s = 0.0
    try:
        for i, batch in enumerate(loader):
            if i >= steps:
                break
            dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, step, metrics = train_step(
                params, opt_state, dev_batch, step)
            audio_s += batch["mask"].sum() * cfg.frontend.hop_length \
                / cfg.frontend.sample_rate
            if (i + 1) % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                print(f"step {i+1}/{steps} loss={m['loss']:.4f} "
                      f"ctc={m['ctc']:.4f} lid={m['lid']:.4f} "
                      f"emo={m['emotion']:.4f} "
                      f"audio_h/min={audio_s/3600/(dt/60):.2f}", flush=True)
    finally:
        loader.close()
    if ckpt:
        save_checkpoint(ckpt, jax.device_get(params))
        print(f"saved checkpoint to {ckpt}")
    return params


def pretrain(manifest: str, *, steps: int, batch_size: int,
             cfg: PipelineConfig, lr: float = 2e-3,
             window_seconds: float = 15.0, ckpt: str | None = None,
             log_every: int = 10, seed: int = 0):
    """Self-supervised pretraining (BEST-RQ): needs only audio — manifest
    ``text`` fields are ignored. Saves encoder params that warm-start
    supervised training."""
    from .pretrain import make_pretrain_step
    from .step import make_optimizer

    mesh = build_mesh(cfg.mesh)
    loader = BatchLoader(manifest, cfg, batch_size=batch_size,
                         window_seconds=window_seconds, seed=seed)
    init_state, step_fn = make_pretrain_step(
        cfg, mesh, tx=make_optimizer(lr=lr))
    params, quantizer, opt_state = init_state(seed=seed)
    step = jnp.zeros((), jnp.int32)

    from ..ops.mel_pallas import MelFrontend, log_mel_frames_pallas

    fe = MelFrontend(cfg.frontend)

    @jax.jit
    def to_mel(samples, T):
        frames = jax.vmap(lambda x: fe.frames_from_signal(x)[0])(samples)
        B, T_pad, n_fft = frames.shape
        mel = log_mel_frames_pallas(frames.reshape(B * T_pad, n_fft), fe.cw,
                                    fe.sw, fe.fb, cfg.frontend,
                                    interpret=fe.interpret)
        return mel.reshape(B, T_pad, -1)

    try:
        for i, batch in enumerate(loader):
            if i >= steps:
                break
            T = batch["mask"].shape[1]
            mel = to_mel(jnp.asarray(batch["samples"]), T)[:, :T]
            dev_batch = {"mel": mel, "mask": jnp.asarray(batch["mask"])}
            params, opt_state, step, metrics = step_fn(
                params, quantizer, opt_state, dev_batch, step)
            if (i + 1) % log_every == 0:
                print(f"pretrain step {i+1}/{steps} "
                      f"loss={float(metrics['loss']):.4f} "
                      f"masked_acc={float(metrics['masked_acc']):.3f}",
                      flush=True)
    finally:
        loader.close()
    if ckpt:
        save_checkpoint(ckpt, jax.device_get(params["encoder"]))
        print(f"saved pretrained encoder to {ckpt}")
    return params


def main():
    from ..utils.term import install_sigterm_exit

    install_sigterm_exit()
    ap = argparse.ArgumentParser(description="Train the omnilingual ASR model")
    ap.add_argument("manifest")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--window-seconds", type=float, default=15.0)
    ap.add_argument("--mesh-data", type=int, default=-1)
    ap.add_argument("--mesh-model", type=int, default=1)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CI / smoke tests)")
    ap.add_argument("--pretrain", action="store_true",
                    help="BEST-RQ self-supervised pretraining (audio only)")
    args = ap.parse_args()

    cfg = tiny_config() if args.tiny else PipelineConfig()
    cfg = cfg.replace(mesh=MeshConfig(data=args.mesh_data,
                                      model=args.mesh_model))
    fn = pretrain if args.pretrain else train
    fn(args.manifest, steps=args.steps, batch_size=args.batch_size,
       cfg=cfg, lr=args.lr, window_seconds=args.window_seconds,
       ckpt=args.ckpt)


if __name__ == "__main__":
    main()
