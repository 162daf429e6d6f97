"""End-to-end learning proof: the framework can actually learn speech->text.

Overfits the tiny conformer+CTC on four synthetic 'utterances' (distinct
tone patterns paired with short texts), then greedy-decodes them exactly.
This closes the loop the reference never had locally: audio -> features ->
encoder -> CTC -> text, all trained and decoded inside this framework.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnilingual_asr_tpu.config import MeshConfig, tiny_config
from omnilingual_asr_tpu.ops.ctc import text_to_byte_labels
from omnilingual_asr_tpu.parallel.mesh import build_mesh
from omnilingual_asr_tpu.train.step import make_optimizer, make_train_step
from omnilingual_asr_tpu.utils.metrics import cer

TEXTS = ["aba", "dodo", "mim", "xyxy"]
SR = 16000
SECONDS = 1.0


def synth(i: int) -> np.ndarray:
    """Distinct tone pattern per utterance."""
    t = np.arange(int(SECONDS * SR)) / SR
    f = 180 + 90 * i
    x = 0.4 * np.sin(2 * np.pi * f * t)
    x += 0.2 * np.sin(2 * np.pi * (f * 2.3) * t) * (np.sin(2 * np.pi * (2 + i) * t) > 0)
    return x.astype(np.float32)


@pytest.mark.slow
def test_overfit_and_decode_exactly():
    cfg = tiny_config().replace(mesh=MeshConfig(data=1, model=1))
    mesh = build_mesh(cfg.mesh, devices=jax.devices()[:1])
    init_state, train_step = make_train_step(
        cfg, mesh, tx=make_optimizer(lr=3e-3, warmup_steps=20),
        from_samples=True)
    state = init_state(seed=0)
    params, opt_state, step = state.params, state.opt_state, state.step

    B = len(TEXTS)
    n_samp = int(SECONDS * SR)
    n_frames = cfg.frontend.frames_for_samples(n_samp)
    sub = cfg.encoder.subsample_factor
    T = ((n_frames + sub - 1) // sub) * sub
    L = 16
    labels = np.zeros((B, L), np.int32)
    lmask = np.zeros((B, L), bool)
    for i, text in enumerate(TEXTS):
        labels[i], lmask[i] = text_to_byte_labels(text, cfg.vocab, L)
    batch = {
        "samples": jnp.asarray(np.stack([synth(i) for i in range(B)])),
        "mask": jnp.asarray(np.tile(np.arange(T)[None, :] < n_frames,
                                    (B, 1))),
        "labels": jnp.asarray(labels),
        "label_mask": jnp.asarray(lmask),
        "lid_label": jnp.zeros((B,), jnp.int32),
        "emotion_label": jnp.zeros((B,), jnp.int32),
    }

    first = last = None
    # 600 iterations: at 400 the 4-utterance overfit sat right at the
    # assertion edge (mean CER 0.167 vs the 0.15 bound, 'aba' unlearned)
    # on this host — the margin is training, not a looser bound.
    for it in range(600):
        params, opt_state, step, metrics = train_step(
            params, opt_state, batch, step)
        loss = float(metrics["ctc"])
        if first is None:
            first = loss
        last = loss
        if loss < 0.02:
            break
    assert last < first, (first, last)
    assert last < 1.0, f"CTC loss failed to converge: {first} -> {last}"

    # Decode with the trained params: mel -> forward -> greedy collapse.
    from omnilingual_asr_tpu.models.conformer import asr_forward
    from omnilingual_asr_tpu.ops.ctc import segments_from_alignment
    from omnilingual_asr_tpu.ops.mel_pallas import MelFrontend, log_mel_frames_pallas

    fe = MelFrontend(cfg.frontend)

    def frames_one(x):
        return fe.frames_from_signal(x)[0]

    frames = jax.vmap(frames_one)(batch["samples"])
    Bz, T_pad, n_fft = frames.shape
    mel = log_mel_frames_pallas(frames.reshape(Bz * T_pad, n_fft), fe.cw,
                                fe.sw, fe.fb, cfg.frontend,
                                interpret=fe.interpret)
    mel = mel.reshape(Bz, T_pad, -1)[:, :T]
    out = asr_forward(params, mel, batch["mask"], cfg)
    n_real = 1 + cfg.vocab.n_bytes
    ids = np.asarray(jnp.argmax(out["ctc_logits"][..., :n_real], axis=-1))
    n_sub = int(np.asarray(out["mask"][0]).sum())

    frame_dur = cfg.frontend.hop_length * sub / SR
    total_cer = []
    for i, want in enumerate(TEXTS):
        segs = segments_from_alignment(ids[i], frame_dur, cfg.vocab,
                                       cfg.decode, n_valid_frames=n_sub)
        hyp = "".join(s.text for s in segs)
        total_cer.append(cer(want, hyp))
    # Overfit on 4 utterances must reproduce them near-exactly.
    assert np.mean(total_cer) < 0.15, (total_cer,
                                       [(t, float(c)) for t, c in
                                        zip(TEXTS, total_cer)])
