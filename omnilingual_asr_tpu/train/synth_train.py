"""Synthetic-corpus multi-task training: the round-2 path to a real
checkpoint (VERDICT r1 #2).

Trains every head at once — byte CTC, frame LID (code-switch aware),
emotion, AAM-softmax speaker, and the X->English translation decoder —
on the unbounded formant-speech stream from train/synth.py plus the real
gettysburg windows, with held-out evaluation (synthetic seeds disjoint from
training, plus the final 25% of gettysburg never trained on).

    python -m omnilingual_asr_tpu.train.synth_train --steps 20000 \
        --batch-size 16 --ckpt-dir /tmp/ckpt
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MeshConfig, PipelineConfig, tiny_config
from ..models.conformer import asr_forward
from ..ops.ctc import collapse_ctc
from ..parallel.mesh import build_mesh
from ..utils.metrics import aggregate_wer
from .augment import SpecAugmentConfig
from .step import make_optimizer, make_train_step
from .synth import SynthBatcher, eval_set, real_corpus


def save_train_state(path: Path, opt_state, step: int,
                     best_score: float) -> None:
    """Persist the FULL training state (optimizer moments + schedule count
    + step + selection score) next to the param checkpoint, atomically.

    Segmented runs on the tunnel (TRAINING_NOTES.md: wedges force ≤1500-step
    segments) previously resumed params only, so every segment restarted
    Adam's moments and the lr schedule from zero — the measured "post-resume
    bounce" that kept the d512×12 rung from ever reaching d256 quality.
    The optimizer pytree is flattened positionally (same optimizer chain on
    both sides, shape-checked on restore)."""
    import io

    leaves = jax.tree_util.tree_leaves(jax.device_get(opt_state))
    flat = {f"l{i:05d}": np.asarray(v) for i, v in enumerate(leaves)}
    flat["__step__"] = np.asarray(int(step), np.int64)
    flat["__best__"] = np.asarray(float(best_score), np.float64)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.parent / (path.name + ".tmp")
    tmp.write_bytes(buf.getvalue())
    tmp.replace(path)   # atomic: a watchdog kill mid-save cannot corrupt


def load_train_state(path: Path, opt_state_template):
    """Restore (opt_state, step, best_score) saved by save_train_state.

    The template (a freshly initialized opt_state with the same optimizer
    chain and param tree) supplies structure, dtypes and shardings; leaves
    are matched positionally and shape-checked."""
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    leaves, treedef = jax.tree_util.tree_flatten(opt_state_template)
    n_saved = sum(1 for k in data if k.startswith("l"))
    if n_saved != len(leaves):
        raise ValueError(
            f"{path}: {n_saved} saved leaves vs {len(leaves)} in the "
            "optimizer template (different optimizer chain or model dims)")
    new = []
    for i, leaf in enumerate(leaves):
        arr = data[f"l{i:05d}"]
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"{path}: leaf {i} has shape {arr.shape}, template expects "
                f"{tuple(leaf.shape)}")
        new.append(jax.device_put(arr.astype(leaf.dtype), leaf.sharding))
    return (jax.tree_util.tree_unflatten(treedef, new),
            int(data["__step__"]), float(data["__best__"]))


def _ids_to_text(frame_ids: np.ndarray, vocab) -> str:
    units = collapse_ctc(frame_ids, blank_id=vocab.blank_id)
    byte_vals = [vocab.id_to_byte(u.byte_id) for u in units]
    byte_vals = [b for b in byte_vals if 0 <= b < 256]
    return bytes(byte_vals).decode("utf-8", errors="replace")


class Evaluator:
    """Greedy-CTC WER/CER on fixed held-out sets, via one jitted forward."""

    def __init__(self, cfg: PipelineConfig, *, window_seconds: float,
                 n_synth: int = 48, batch: int = 8,
                 frame_multiple: int = 0):
        self.cfg = cfg
        fe = cfg.frontend
        self.window_samples = int(window_seconds * fe.sample_rate)
        n_frames = fe.frames_for_samples(self.window_samples)
        sub = cfg.encoder.subsample_factor
        mult = max(frame_multiple, sub)
        self.window_frames = ((n_frames + mult - 1) // mult) * mult
        self.batch = batch

        from .synth import trim_to_window

        synth = eval_set(n_synth)
        trimmed = [trim_to_window(e, self.window_samples) for e in synth]
        self.sets: Dict[str, List[Tuple[np.ndarray, str]]] = {
            "synth": [(x, t) for (x, t, _, _) in trimmed if t],
        }
        _, real_eval = real_corpus(window_s=window_seconds)
        if real_eval:
            self.sets["gettysburg_heldout"] = [
                (w["samples"], w["text"]) for w in real_eval
                if w["language"] == "English"]

        from ..ops.mel_pallas import MelFrontend, log_mel_frames_pallas

        fe_dev = MelFrontend(cfg.frontend)
        wf = self.window_frames

        def forward(params, samples, n_valid):
            frames = jax.vmap(
                lambda x: fe_dev.frames_from_signal(x)[0])(samples)
            B, T_pad, n_fft = frames.shape
            mel = log_mel_frames_pallas(
                frames.reshape(B * T_pad, n_fft), fe_dev.cw, fe_dev.sw,
                fe_dev.fb, cfg.frontend, interpret=fe_dev.interpret)
            mel = mel.reshape(B, T_pad, -1)[:, :wf]
            mask = jnp.arange(wf)[None, :] < n_valid[:, None]
            out = asr_forward(params, mel, mask, cfg)
            n_real = 1 + cfg.vocab.n_bytes
            ids = jnp.argmax(out["ctc_logits"][..., :n_real], axis=-1)
            return ids.astype(jnp.int32), out["mask"]

        self._forward = jax.jit(forward)

    def _decode_batch(self, params, samples_list) -> List[str]:
        fe = self.cfg.frontend
        out: List[str] = []
        for b0 in range(0, len(samples_list), self.batch):
            chunk = samples_list[b0:b0 + self.batch]
            B = len(chunk)
            x = np.zeros((self.batch, self.window_samples), np.float32)
            nv = np.zeros(self.batch, np.int32)
            for i, s in enumerate(chunk):
                n = min(len(s), self.window_samples)
                x[i, :n] = s[:n]
                nv[i] = fe.frames_for_samples(n)
            ids, mask = self._forward(params, jnp.asarray(x), jnp.asarray(nv))
            ids = np.asarray(ids)
            mask = np.asarray(mask)
            for i in range(B):
                nf = int(mask[i].sum())
                out.append(_ids_to_text(ids[i, :nf], self.cfg.vocab))
        return out

    def run(self, params) -> Dict[str, Dict[str, float]]:
        report: Dict[str, Dict[str, float]] = {}
        for name, items in self.sets.items():
            hyps = self._decode_batch(params, [s for s, _ in items])
            pairs = [(t, h) for (_, t), h in zip(items, hyps)]
            report[name] = aggregate_wer(pairs)
        return report


def train_synth(*, steps: int, batch_size: int, cfg: PipelineConfig,
                lr: float = 2e-3, window_seconds: float = 8.0,
                ckpt_dir: Optional[str] = None, log_every: int = 50,
                eval_every: int = 1000, seed: int = 0,
                warmup_steps: int = 1000,
                resume_from: Optional[str] = None,
                total_steps: int = 0, resume_opt: bool = True,
                init_encoder: Optional[str] = None,
                metrics_log: Optional[str] = None,
                pallas_kernels: bool = False,
                stage1_steps: int = 0, stage2_steps: int = 0,
                pool_schedule: Optional[str] = None,
                fce_steps: int = 0, aux_off: bool = False,
                aux_ramp_start: int = 0, aux_ramp_steps: int = 2000,
                speed_perturb: float = 0.0, wire: str = "i16",
                channel_aug: float = 0.0, real_match: float = 0.0,
                english_fraction: float = 0.0, voice_match: float = 0.0,
                english_sentences: float = 0.0, real_fraction: float = 0.15,
                select: str = "synth", select_synth_cap: float = 0.08,
                device_pool: int = 0, pool_refresh_every: int = 150,
                dropout: float = 0.0, weight_decay: float = 1e-6):
    mesh = build_mesh(cfg.mesh)
    use_pool = device_pool > 0
    if use_pool:
        # device-resident pool: round up so refresh slices tile the pool
        device_pool = ((device_pool + batch_size - 1)
                       // batch_size) * batch_size
    frame_multiple = 0
    if pallas_kernels:
        # train through the Pallas flash-attention + fused-conv kernels
        # (custom VJPs, ops/attention.py + ops/conv_module.py): pad T so
        # T/sub tiles the flash Q blocks. TPU-only (Mosaic lowering).
        import dataclasses as _dc

        from ..ops.attention import BLOCK_Q

        if jax.default_backend() != "tpu":
            raise SystemExit("--pallas-kernels requires a TPU backend")
        sub = cfg.encoder.subsample_factor
        frame_multiple = BLOCK_Q * sub
        cfg = cfg.replace(encoder=_dc.replace(
            cfg.encoder, use_flash_attention=True, use_fused_conv=True))
    batcher = SynthBatcher(cfg, batch_size=batch_size,
                           window_seconds=window_seconds, seed=seed,
                           frame_multiple=frame_multiple,
                           n_threads=2, snr_range=(15.0, 40.0),
                           # single-core host: reuse clean examples with
                           # fresh per-draw noise/gain, amortizing synthesis
                           reuse_pool=6144, reuse_p=0.8,
                           speed_range=((1.0 - speed_perturb,
                                         1.0 + speed_perturb)
                                        if speed_perturb > 0 else None),
                           channel_aug_p=channel_aug,
                           real_match_p=real_match,
                           english_fraction=english_fraction,
                           voice_match_p=voice_match,
                           english_sentence_p=english_sentences,
                           real_fraction=real_fraction,
                           bake_mode=use_pool)
    # Length curriculum (CTC from scratch sits on a "unigram prior" plateau
    # until alignment locks in; short utterances have exponentially fewer
    # alignment paths and break out far sooner — see tools/diag_overfit.py):
    #   stage 1: 1-2 word utterances, aux losses + SpecAugment off
    #   stage 2: <=5 words + code-switch, everything ramps on
    #   stage 3: full-length mix incl. real windows
    # Pool-size curriculum ("256:1.0:2500,1024:0.92:2500,...:0" — last
    # entry with steps=0 holds for the rest of the run): memorize a small
    # pool to break the CTC prior plateau, then grow it so held-out
    # generalization takes over.
    pool_stages: List[Tuple[int, float, int]] = []
    if pool_schedule:
        for part in pool_schedule.split(","):
            pmax, rp, n = part.split(":")
            pool_stages.append((int(pmax), float(rp), int(n)))
        p0 = pool_stages[0]
        batcher.set_pool(p0[0], p0[1])
        print(f"pool stage 0: max={p0[0]} reuse_p={p0[1]}", flush=True)
    pool_boundaries = []
    acc = 0
    for (pmax, rp, n) in pool_stages[:-1] if pool_stages else []:
        acc += n
        pool_boundaries.append(acc)

    curriculum = stage1_steps > 0 or stage2_steps > 0
    if stage1_steps > 0:
        batcher.set_curriculum(min_words=1, max_words=2, simple_only=True)
    elif stage2_steps > 0:   # resumed run entering directly at stage 2
        batcher.set_curriculum(min_words=1, max_words=5)

    def stage_weights(i: int):
        # Frame-CE bootstrap (train/step.py loss_fn): blank-excluded frame
        # CE and per-token CTC are non-competing, so both run at full
        # weight; frame CE anneals out over [fce, 2*fce) once CTC has
        # locked onto the bootstrapped acoustics.
        if fce_steps > 0:
            w_fce = float(np.clip(2.0 - i / float(fce_steps), 0.0, 1.0))
        else:
            w_fce = 0.0
        w_ctc = 1.0
        if aux_ramp_start > 0:
            # TRAINING_NOTES.md round-3 recipe step 2: start from the
            # proven aux-off regime, then ramp speaker/translation/
            # SpecAugment 0 -> 1 over aux_ramp_steps once CTC has locked.
            # The w_* scalars ride in the batch (traced), so the schedule
            # costs no recompile.
            w_aux = float(np.clip(
                (i - aux_ramp_start) / max(1, aux_ramp_steps), 0.0, 1.0))
            return {"w_spk": w_aux, "w_trans": w_aux, "w_aug": w_aux,
                    "w_fce": w_fce, "w_ctc": w_ctc}
        if aux_off:
            # CTC(+frame-CE)-only gate runs (TRAINING_NOTES.md round-3
            # recipe): drop the speaker/translation/SpecAugment terms
            # without stage 1's utterance-length restriction.
            return {"w_spk": 0.0, "w_trans": 0.0, "w_aug": 0.0,
                    "w_fce": w_fce, "w_ctc": w_ctc}
        if not curriculum:
            return {"w_spk": 1.0, "w_trans": 1.0, "w_aug": 1.0,
                    "w_fce": w_fce, "w_ctc": w_ctc}
        if i < stage1_steps:
            return {"w_spk": 0.0, "w_trans": 0.0, "w_aug": 0.0,
                    "w_fce": w_fce, "w_ctc": w_ctc}
        return {"w_spk": 1.0, "w_trans": 1.0, "w_aug": 1.0,
                "w_fce": w_fce, "w_ctc": w_ctc}

    # Schedule horizon: with --total-steps the cosine spans the WHOLE
    # segmented run (each segment passes the same total and resumes the
    # schedule mid-curve via the restored optimizer count); otherwise it
    # completes at this invocation's end as before.
    horizon = max(total_steps or steps, warmup_steps + 1)
    tx = make_optimizer(lr=lr, warmup_steps=warmup_steps,
                        decay_steps=horizon, weight_decay=weight_decay)
    # Opt-in training dropout (models/conformer.asr_forward dropout_rng):
    # --dropout R overrides cfg.encoder.dropout and switches the step's
    # dropout rng on. Off by default — existing recipes are unchanged.
    use_dropout = dropout > 0.0
    if use_dropout:
        import dataclasses as _dc

        cfg = cfg.replace(encoder=_dc.replace(cfg.encoder, dropout=dropout))
        print(f"training dropout: {dropout} (weight decay {weight_decay})",
              flush=True)
    # milder than the ASR default: synthetic units are short (one char
    # ~= 2-3 subsampled frames), so 0.6 s time masks would erase whole
    # words of supervision
    aug_cfg = SpecAugmentConfig(n_freq_masks=1, freq_mask_width=16,
                                n_time_masks=1, time_mask_width=24)
    if use_pool:
        from jax.sharding import NamedSharding, PartitionSpec

        from .device_pool import (build_pool, encode_wire,
                                  make_pool_train_step)

        init_state, pool_step, refresh_pool = make_pool_train_step(
            cfg, mesh, tx=tx, augment=aug_cfg, with_translator=True,
            snr_range=(15.0, 40.0), dropout=use_dropout)
        print(f"building device pool: {device_pool} entries "
              f"({wire} wire)...", flush=True)
        refresh_iter = iter(batcher)
        pool_np = build_pool(refresh_iter, device_pool, wire=wire)
        pool_nframes = pool_np["mask"].sum(axis=1).astype(np.float64)
        repl = NamedSharding(mesh, PartitionSpec())
        pool = {k: jax.device_put(v, repl) for k, v in pool_np.items()}
        pool_mb = sum(v.nbytes for v in pool_np.values()) / 1e6
        print(f"device pool resident: {pool_mb:.0f} MB; per-step H2D is "
              f"now {4 * batch_size} B of indices", flush=True)
        del pool_np
        pool_cursor = 0
        idx_rng = np.random.default_rng(seed + 104729)
    else:
        sample = next(iter(batcher))
        init_state, train_step = make_train_step(
            cfg, mesh, tx=tx,
            from_samples=True,
            batch_keys=tuple(sample.keys()) + ("w_spk", "w_trans", "w_aug",
                                               "w_fce", "w_ctc"),
            with_translator=True,
            augment=aug_cfg, dropout=use_dropout)
    state = init_state(seed=seed)
    params, opt_state, step = state.params, state.opt_state, state.step
    start_step = 0
    best_wer = float("inf")
    if resume_from:
        from ..models.translation import load_translator
        from ..models.zoo import load_checkpoint

        asr = load_checkpoint(Path(resume_from) / "asr", cfg)
        try:
            trans = load_translator(Path(resume_from) / "translator", cfg)
            jax.tree.map(lambda a, b: None, trans, params["translator"])
        except (ValueError, TypeError, KeyError) as e:
            # A trunk reconstructed from a RELEASE carries the shipped
            # TEXT-mode translator (embed/pos decoder over transcript
            # bytes), whose tree does not match the joint audio-mode
            # decoder this trainer trains through the encoder states.
            # The joint translator is re-trained from step one anyway, so
            # a fresh init is the correct fallback — only the ASR trunk's
            # warm start matters.
            print(f"translator resume skipped (structure mismatch: "
                  f"{str(e)[:120]}); joint translator starts fresh",
                  flush=True)
            trans = jax.device_get(params["translator"])
        params = jax.device_put(
            {"asr": asr, "translator": trans},
            jax.tree.map(lambda x: x.sharding, params))
        print(f"resumed params from {resume_from}", flush=True)
        ts_path = Path(resume_from) / "train_state.npz"
        if resume_opt and ts_path.exists():
            try:
                opt_state, start_step, best_wer = load_train_state(
                    ts_path, opt_state)
                step = jnp.asarray(start_step, jnp.int32)
                print(f"resumed optimizer/schedule from {ts_path} "
                      f"(step {start_step}, best {best_wer:.4f})",
                      flush=True)
            except Exception as e:   # params-only fallback (old checkpoints)
                print(f"train_state restore failed ({e}); optimizer "
                      "restarts (params-only resume)", flush=True)
    elif init_encoder:
        # Warm start the trunk from a BEST-RQ pretrain checkpoint
        # (train/pretrain.py): same asr_init tree, translator stays fresh.
        from ..models.zoo import load_checkpoint

        enc = load_checkpoint(Path(init_encoder), cfg)
        params = {
            "asr": jax.device_put(
                enc, jax.tree.map(lambda x: x.sharding, params["asr"])),
            "translator": params["translator"],
        }
        print(f"encoder warm-started from {init_encoder}", flush=True)

    evaluator = Evaluator(cfg, window_seconds=window_seconds,
                          frame_multiple=frame_multiple)
    mlog = open(metrics_log, "a") if metrics_log else None

    def save(tag: str):
        if not ckpt_dir:
            return
        from ..models.translation import save_translator
        from ..models.zoo import save_checkpoint

        host = jax.device_get(params)
        out = Path(ckpt_dir) / tag
        save_checkpoint(out / "asr", host["asr"])
        save_translator(out / "translator", host["translator"])
        # Self-describing like a release: eval tools read these dims via
        # config_for_checkpoint() instead of trusting from_env discovery.
        (out / "config.json").write_text(cfg.to_json())
        print(f"saved checkpoint -> {out}", flush=True)

    t0 = time.perf_counter()
    audio_s = 0.0
    # i is the GLOBAL step: curricula/ramps/eval cadence are positions in
    # the whole (possibly segmented) run, so a resumed segment passes the
    # same flags and continues the schedule instead of replaying it.
    end_step = start_step + steps
    if total_steps:
        end_step = min(end_step, total_steps)
    try:
        batch_iter = None if use_pool else iter(batcher)
        for i in range(start_step, end_step):
            batch = None if use_pool else next(batch_iter)
            if pool_boundaries and i == pool_boundaries[0]:
                pool_boundaries.pop(0)
                nxt = pool_stages[len(pool_stages) - len(pool_boundaries) - 1]
                batcher.set_pool(nxt[0], nxt[1])
                print(f"pool stage at step {i}: max={nxt[0]} "
                      f"reuse_p={nxt[1]}", flush=True)
            if curriculum and stage1_steps and i == stage1_steps:
                batcher.set_curriculum(min_words=1, max_words=5,
                                       clear_pool=True)
                print(f"curriculum stage 2 at step {i}", flush=True)
            if curriculum and stage2_steps and i == stage1_steps + stage2_steps:
                batcher.set_curriculum()  # full-length mix + real windows
                print(f"curriculum stage 3 at step {i}", flush=True)
            scalars = {k: jnp.float32(v) for k, v in stage_weights(i).items()}
            if use_pool:
                idx = idx_rng.integers(0, device_pool, batch_size)
                params, opt_state, step, metrics = pool_step(
                    params, opt_state, pool, jnp.asarray(idx, jnp.int32),
                    step, scalars)
                audio_s += float(pool_nframes[idx].sum()) \
                    * cfg.frontend.hop_length / cfg.frontend.sample_rate
                if pool_refresh_every and (i + 1) % pool_refresh_every == 0:
                    # rotate one freshly baked batch into the pool (donated
                    # dynamic_update_slice: ~B/P of the pool churns per
                    # refresh, full churn every P/B * refresh_every steps)
                    nb = next(refresh_iter)
                    new = {k: (encode_wire(v, wire) if k == "samples" else v)
                           for k, v in nb.items()}
                    pool = refresh_pool(pool, jnp.int32(pool_cursor),
                                        {k: jax.device_put(v, repl)
                                         for k, v in new.items()})
                    pool_nframes[pool_cursor:pool_cursor + batch_size] = \
                        nb["mask"].sum(axis=1)
                    pool_cursor = (pool_cursor + batch_size) % device_pool
            else:
                if wire == "mulaw":
                    from ..audio.codec import mulaw_encode

                    enc = mulaw_encode
                else:
                    def enc(v):
                        return np.clip(v * 32768.0, -32768,
                                       32767).astype(np.int16)
                dev_batch = {
                    k: jnp.asarray(enc(v) if k == "samples" else v)
                    for k, v in batch.items()}
                dev_batch.update(scalars)
                params, opt_state, step, metrics = train_step(
                    params, opt_state, dev_batch, step)
                audio_s += float(batch["mask"].sum()) \
                    * cfg.frontend.hop_length / cfg.frontend.sample_rate
                # The tunnel PJRT client retains host-side transfer buffers
                # roughly linearly in bytes shipped (observed: 130 GB RSS ->
                # OOM kill at step ~6350 of a batch-64 i16 run). Deleting
                # the device arrays promptly + a periodic GC keeps the
                # reachable set minimal; --wire mulaw halves the leak rate;
                # --device-pool removes the per-step transfer entirely.
                for v in dev_batch.values():
                    if hasattr(v, "delete"):
                        try:
                            v.delete()
                        except Exception:
                            pass
            if (i + 1) % 500 == 0:
                import gc

                gc.collect()
            if (i + 1) % log_every == 0:
                m = {k: round(float(v), 4) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                line = {"step": i + 1, **m,
                        "steps_per_s": round((i + 1 - start_step) / dt, 2),
                        "audio_h": round(audio_s / 3600, 2)}
                print(json.dumps(line), flush=True)
                if mlog:
                    mlog.write(json.dumps(line) + "\n")
                    mlog.flush()
            if (i + 1) % eval_every == 0 or i + 1 == end_step:
                host = jax.device_get(params)
                report = evaluator.run(host["asr"])
                rline = {"step": i + 1, "eval": {
                    k: {m: round(v, 4) for m, v in r.items()}
                    for k, r in report.items()}}
                print(json.dumps(rline), flush=True)
                if mlog:
                    mlog.write(json.dumps(rline) + "\n")
                    mlog.flush()
                w = report.get("synth", {}).get("wer", float("inf"))
                if select == "transfer":
                    # English-transfer selection: minimize real-recording
                    # held-out CER among evals whose synth WER stays under
                    # the cap (don't trade the 8-language corpus away)
                    c = report.get("gettysburg_heldout",
                                   {}).get("cer", float("inf"))
                    score = c if w <= select_synth_cap else float("inf")
                else:
                    score = w
                if score < best_wer:
                    best_wer = score
                    save("best")
                    if ckpt_dir:
                        # selected-best eval next to the weights: drivers
                        # read THIS instead of re-deriving the selection
                        # rule from the (append-mode) metrics log
                        (Path(ckpt_dir) / "best" / "eval.json").write_text(
                            json.dumps(rline))
                save("last")
                if ckpt_dir:
                    save_train_state(
                        Path(ckpt_dir) / "last" / "train_state.npz",
                        opt_state, i + 1, best_wer)
    finally:
        batcher.close()
        if mlog:
            mlog.close()
    return params, best_wer


def main():
    from ..utils.term import install_sigterm_exit

    install_sigterm_exit()
    ap = argparse.ArgumentParser(
        description="Multi-task training on the synthetic corpus")
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--warmup-steps", type=int, default=1000)
    ap.add_argument("--window-seconds", type=float, default=8.0)
    ap.add_argument("--mesh-data", type=int, default=-1)
    ap.add_argument("--mesh-model", type=int, default=1)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume-from", default=None)
    ap.add_argument("--total-steps", type=int, default=0,
                    help="GLOBAL schedule horizon for segmented runs: the "
                         "lr cosine spans this many steps, --steps bounds "
                         "only this invocation, and the restored optimizer "
                         "count resumes the schedule mid-curve. 0 = this "
                         "invocation is the whole run (legacy)")
    ap.add_argument("--no-resume-opt", action="store_true",
                    help="resume params only, ignoring train_state.npz "
                         "(fresh optimizer — the pre-round-4 behavior)")
    ap.add_argument("--init-encoder", default=None,
                    help="warm-start the trunk from a BEST-RQ pretrain "
                         "checkpoint dir (train/pretrain.py --ckpt-dir's "
                         "asr/ subdir); ignored with --resume-from")
    ap.add_argument("--metrics-log", default=None)
    ap.add_argument("--pallas-kernels", action="store_true",
                    help="train through the flash-attention + fused-conv "
                         "Pallas kernels (TPU only; pads T to tile blocks)")
    ap.add_argument("--stage1-steps", type=int, default=0,
                    help="length-curriculum stage 1 (1-2 words, aux losses "
                         "off); 0 disables the curriculum")
    ap.add_argument("--stage2-steps", type=int, default=0,
                    help="stage 2 length (<=5 words); then full mix")
    ap.add_argument("--pool-schedule", default=None,
                    help="pool-size curriculum 'max:reuse_p:steps,...' "
                         "(last steps=0 holds); e.g. "
                         "'256:1.0:2500,1024:0.92:2500,4096:0.85:0'")
    ap.add_argument("--fce-steps", type=int, default=0,
                    help="frame-level char-CE bootstrap: full weight "
                         "through N steps, linear decay to 0 by 2N")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--d-model", type=int, default=0,
                    help="override encoder d_model (scale-ladder rungs, "
                         "e.g. 256/384/512); 0 keeps the config default")
    ap.add_argument("--n-layers", type=int, default=0,
                    help="override encoder n_layers; 0 keeps the default")
    ap.add_argument("--n-heads", type=int, default=0,
                    help="override encoder n_heads; 0 keeps the default")
    ap.add_argument("--conv-kernel", type=int, default=0,
                    help="override conformer conv kernel; 0 keeps default")
    ap.add_argument("--aux-ramp-start", type=int, default=0,
                    help="step at which the speaker/translation/SpecAugment "
                         "weights start ramping 0->1 (0 disables; combine "
                         "with --aux-off semantics before the ramp)")
    ap.add_argument("--aux-ramp-steps", type=int, default=2000,
                    help="length of the aux-weight ramp")
    ap.add_argument("--speed-perturb", type=float, default=0.0,
                    help="sox-style speed perturbation: rate drawn from "
                         "(1-P, 1+P) per example; 0 disables")
    ap.add_argument("--real-match", type=float, default=0.0,
                    help="probability of EQ-matching English draws to the "
                         "real recording's long-term average spectrum")
    ap.add_argument("--english-fraction", type=float, default=0.0,
                    help="pin this share of synthetic draws to English "
                         "(0 = uniform over languages) — the English-"
                         "transfer fine-tune knob")
    ap.add_argument("--voice-match", type=float, default=0.0,
                    help="probability an English synth draw renders in the "
                         "real recording's (perturbed) voice, labeled "
                         "speaker 0")
    ap.add_argument("--english-sentences", type=float, default=0.0,
                    help="probability an English synth draw uses the "
                         "grammatical sentence bank instead of an i.i.d. "
                         "lexicon draw")
    ap.add_argument("--real-fraction", type=float, default=0.15,
                    help="share of draws that are real-recording crops")
    ap.add_argument("--select", default="synth",
                    choices=["synth", "transfer"],
                    help="best/ selection: min synth WER (default), or "
                         "'transfer' = min gettysburg held-out CER among "
                         "evals with synth WER <= --select-synth-cap")
    ap.add_argument("--select-synth-cap", type=float, default=0.08)
    ap.add_argument("--channel-aug", type=float, default=0.0,
                    help="probability of per-draw room/channel simulation "
                         "(synthetic reverb + spectral tilt); decorrelates "
                         "the model from the corpus's dry channel")
    ap.add_argument("--wire", default="i16", choices=["i16", "mulaw"],
                    help="H2D sample wire format: mulaw halves ingress "
                         "bytes (~38 dB SNR) — for H2D-bound tunnels")
    ap.add_argument("--device-pool", type=int, default=0,
                    help="device-resident example pool size (entries); "
                         "per-step H2D drops to a [B] index vector and "
                         "gain/noise augmentation runs on-device "
                         "(train/device_pool.py). 0 = off")
    ap.add_argument("--pool-refresh-every", type=int, default=150,
                    help="bake + rotate one fresh batch into the device "
                         "pool every N steps (0 = static pool)")
    ap.add_argument("--aux-off", action="store_true",
                    help="train CTC(+frame-CE) only: zero the speaker/"
                         "translation/SpecAugment weights for the whole "
                         "run (no length restriction)")
    ap.add_argument("--dropout", type=float, default=0.0,
                    help="training-time residual-stream dropout rate "
                         "(0 = off, the legacy behavior; regularization "
                         "for capacity-rich rungs whose train CTC reaches "
                         "~0.04 while held-out WER plateaus)")
    ap.add_argument("--weight-decay", type=float, default=1e-6,
                    help="AdamW decoupled weight decay")
    args = ap.parse_args()

    if args.tiny:
        cfg = tiny_config()
    elif args.resume_from:
        # Resuming: adopt the checkpoint's own config.json dims (it is
        # self-describing, config.py config_for_checkpoint) — otherwise a
        # non-default-dims checkpoint silently builds the code-default
        # model and the load fails on shape mismatch. Explicit --d-model
        # etc. still override below.
        from ..config import config_for_checkpoint

        cfg = config_for_checkpoint(args.resume_from)
        cfg = cfg.replace(checkpoint_path=None)
    else:
        cfg = PipelineConfig()
    cfg = cfg.replace(mesh=MeshConfig(data=args.mesh_data,
                                      model=args.mesh_model))
    enc_over = {k: v for k, v in (("d_model", args.d_model),
                                  ("n_layers", args.n_layers),
                                  ("n_heads", args.n_heads),
                                  ("conv_kernel", args.conv_kernel)) if v}
    if enc_over:
        import dataclasses as _dc

        cfg = cfg.replace(encoder=_dc.replace(cfg.encoder, **enc_over))
        print(f"encoder overrides: {enc_over}", flush=True)
    train_synth(steps=args.steps, batch_size=args.batch_size, cfg=cfg,
                lr=args.lr, window_seconds=args.window_seconds,
                ckpt_dir=args.ckpt_dir, eval_every=args.eval_every,
                seed=args.seed, warmup_steps=args.warmup_steps,
                resume_from=args.resume_from, metrics_log=args.metrics_log,
                total_steps=args.total_steps,
                resume_opt=not args.no_resume_opt,
                init_encoder=args.init_encoder,
                pallas_kernels=args.pallas_kernels,
                stage1_steps=args.stage1_steps,
                stage2_steps=args.stage2_steps,
                pool_schedule=args.pool_schedule,
                fce_steps=args.fce_steps, aux_off=args.aux_off,
                aux_ramp_start=args.aux_ramp_start,
                aux_ramp_steps=args.aux_ramp_steps,
                speed_perturb=args.speed_perturb, wire=args.wire,
                channel_aug=args.channel_aug, real_match=args.real_match,
                english_fraction=args.english_fraction,
                voice_match=args.voice_match,
                english_sentences=args.english_sentences,
                real_fraction=args.real_fraction,
                select=args.select,
                select_synth_cap=args.select_synth_cap,
                device_pool=args.device_pool,
                pool_refresh_every=args.pool_refresh_every,
                dropout=args.dropout, weight_decay=args.weight_decay)


if __name__ == "__main__":
    main()
