"""TranscriptionEngine: local TPU inference engine with the reference engine's
exact surface and semantics.

This is the drop-in replacement for the reference's `GeminiASRPipeline`
(reference src/omnilingual_asr/models/inference/gemini_pipeline.py:313-741):
same methods (`transcribe`, `transcribe_chunked`, `transcribe_with_retry`),
same 4-step progress contract, same result shapes and fixup semantics — but
the compute is a single XLA program on local TPU devices instead of an HTTPS
call (reference :512-530).

Execution model (TPU-first):
- audio is decoded + resampled on host, cut into fixed 30 s windows;
- windows are batched to a fixed [B, T] shape (static shapes — one compile)
  and run through Pallas log-mel + the conformer under jit, with the batch
  dimension sharded over the mesh 'data' axis: the reference's
  ThreadPoolExecutor(4) over API calls (reference :623) becomes windows
  sharded over chips;
- CTC/LID/emotion/speaker outputs are assembled into segments on host;
  speaker clustering runs globally over the file, so labels stay consistent
  across chunk boundaries (fixing the reference defect noted in SURVEY §5).
"""

from __future__ import annotations

import math
import os
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .audio.decode import decode_audio, get_audio_duration
from .audio.resample import resample
from .config import PipelineConfig
from .diarization.cluster import DEFAULT_THRESHOLD as CLUSTER_DEFAULT_THRESHOLD
from .diarization.cluster import ahc_labels
from .models import languages as lang_table
from .models.conformer import (
    asr_forward,
    asr_init,
    asr_param_specs,
    pooled_speaker_embed_np,
)
from .ops.ctc import DecodedSegment, segments_from_alignment
from .ops.mel_pallas import BLOCK_T, MelFrontend, log_mel_frames_pallas
from .parallel.mesh import build_mesh, shard_params
from .types import (
    EMOTIONS,
    TranscriptSegment,
    TranscriptionResult,
)
from .utils.tracing import StageTrace

ProgressCallback = Optional[Callable[[str, int], None]]

# Fixed inference window. 30 s at 16 kHz -> 2998 mel frames -> pad to 3072
# (multiple of both the Pallas mel block and the subsampler factor).
WINDOW_SECONDS = 30.0

# Window for per-segment speaker re-embedding (speaker_mode="crop"): holds
# the 2-10 s segment contract's typical case whole; longer segments are
# center-cropped (speaker identity saturates in a few seconds of speech).
SPK_CROP_SECONDS = 6.0

# AHC merge cut for x-vector embeddings (tuned on eval_diar once trained;
# DecodeConfig.ahc_threshold overrides).
XVECTOR_AHC_THRESHOLD = 0.30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _progress_reporters(progress_callback: ProgressCallback):
    """(report, report_frac) wrappers over the reference 2-arg callback.

    The reference contract is ``progress_callback(step: str, idx: int)``
    called exactly once per step (diarization/pipeline.py:89-90); 2-arg
    callbacks keep that exact behavior. Callbacks that declare a third
    parameter opt in to additional intra-step calls carrying ``fraction``
    in [0, 1] (serving/app.py uses it for SSE batch progress)."""
    if progress_callback is None:
        return (lambda *_: None), (lambda *_: None)
    import inspect

    takes_frac = False
    try:
        sig = inspect.signature(progress_callback)
        n_pos = sum(1 for p in sig.parameters.values()
                    if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD))
        takes_frac = n_pos >= 3 or any(
            p.kind is p.VAR_POSITIONAL for p in sig.parameters.values())
    except (TypeError, ValueError):
        pass

    def report(step: str, idx: int) -> None:
        progress_callback(step, idx)

    if takes_frac:
        def report_frac(step: str, idx: int, fraction: float) -> None:
            progress_callback(step, idx, fraction)
    else:
        def report_frac(step: str, idx: int, fraction: float) -> None:
            pass  # 2-arg callbacks get exactly one call per step

    return report, report_frac


class TranscriptionEngine:
    """Local TPU ASR engine (reference-compatible seam).

    The reference requires an API key and raises without one
    (gemini_pipeline.py:329-334); locally there is no key — `api_key` and
    `model` are accepted for drop-in compatibility and ignored.
    """

    def __init__(
        self,
        api_key: Optional[str] = None,
        model: str = "local-tpu",
        *,
        config: Optional[PipelineConfig] = None,
        params=None,
        mesh=None,
        batch_windows_per_device: int = 4,
        window_seconds: float = WINDOW_SECONDS,
        enable_translation: bool = False,
        translator_params=None,
        translator_path: Optional[str] = None,
        summarizer_params=None,
        summarizer_path: Optional[str] = None,
        quantize: "bool | str" = False,
        long_mode: str = "window",
        ingress: Optional[str] = None,
        speaker_mode: Optional[str] = None,
        xvector_params=None,
        xvector_path: Optional[str] = None,
    ) -> None:
        if long_mode not in ("window", "sequence"):
            raise ValueError(f"long_mode must be 'window' or 'sequence', "
                             f"got {long_mode!r}")
        # Speaker embeddings for diarization. Two orthogonal choices:
        #
        # 1. The EMBEDDER. The trunk's final-layer speaker branch smears
        #    identity across a window via global self-attention (measured:
        #    same/diff-speaker segment distances 0.085/0.055 in a 3-speaker
        #    conversation — inseparable; tools/diag_diar.py). The dedicated
        #    x-vector net (models/xvector.py, ~0.5 s receptive field) keeps
        #    per-frame identity local BY CONSTRUCTION and is used whenever
        #    its weights load (xvector_path / $OMNIASR_XVECTOR / release
        #    xvector.npz).
        # 2. The POOLING strategy (speaker_mode): "inline" pools the main
        #    pass's frames (free); "crop" re-embeds each decoded segment's
        #    audio in its OWN forward pass (isolated re-embeds measure
        #    0.027/0.543 — separable — but cost a second forward); "auto"
        #    (default) picks "inline" when the x-vector is loaded (local
        #    receptive field makes inline safe) and "crop" otherwise.
        speaker_mode = speaker_mode or os.getenv(
            "OMNIASR_SPEAKER_MODE", "auto")
        if speaker_mode not in ("auto", "crop", "inline"):
            raise ValueError(f"speaker_mode must be 'auto', 'crop' or "
                             f"'inline', got {speaker_mode!r}")
        if quantize not in (False, True, "a8", "w8"):
            # A typo like "w8a8" would otherwise silently run the plain
            # dequant path and skip the TP guard (ADVICE r2).
            raise ValueError(f"quantize must be False, True, 'a8' or 'w8', "
                             f"got {quantize!r}")
        #: "window": independent 30 s windows batched over the mesh 'data'
        #: axis (default). "sequence": the WHOLE file runs as ONE sequence
        #: sharded over 'data' via ring attention + conv halo exchange
        #: (parallel/sequence.py) — no window boundaries at all.
        self.long_mode = long_mode
        #: Sample wire format for H2D: "i16" (default, lossless for 16-bit
        #: sources) or "mulaw" (8-bit companded, half the ingress bytes at
        #: ~38 dB SNR — for bandwidth-bound links; audio/codec.py).
        ingress = ingress or os.getenv("OMNIASR_INGRESS", "i16")
        if ingress not in ("i16", "mulaw"):
            raise ValueError(f"ingress must be 'i16' or 'mulaw', "
                             f"got {ingress!r}")
        self.ingress = ingress
        self.config = config or PipelineConfig.from_env()
        self.model = model
        self.last_trace: Optional[StageTrace] = None
        self.mesh = mesh if mesh is not None else build_mesh(self.config.mesh)
        self._frontend = MelFrontend(self.config.frontend)

        cfg = self.config
        # Translation requires trained decoder weights: a random-init decoder
        # would write noise into segment.translation, which is strictly worse
        # than the schema-valid None (reference: null iff English,
        # gemini_pipeline.py:176-179).
        from .models.zoo import default_release_dir

        _release = default_release_dir()

        def _released(name: str) -> Optional[str]:
            if _release is None:
                return None
            p = _release / f"{name}.npz"
            return str(p) if p.is_file() else None

        def _load_decoder(explicit_path, env_name, release_name, n_layers):
            """Explicit paths must load (errors propagate); a discovered
            release file is best-effort — it may belong to a different
            config (e.g. tiny test configs), in which case it is skipped."""
            from .models.translation import load_translator

            path = explicit_path or os.getenv(env_name)
            if path:
                return load_translator(path, cfg, n_layers=n_layers)
            path = _released(release_name)
            if path:
                try:
                    return load_translator(path, cfg, n_layers=n_layers)
                except (KeyError, ValueError):
                    return None
            return None

        self._translator = translator_params
        if self._translator is None:
            self._translator = _load_decoder(
                translator_path, "OMNIASR_TRANSLATOR", "translator", 4)
        if enable_translation and self._translator is None:
            import warnings

            warnings.warn(
                "enable_translation=True but no translator checkpoint is "
                "available (pass translator_params/translator_path or set "
                "OMNIASR_TRANSLATOR); translation stays disabled.",
                stacklevel=2)
        # Neural summarizer: same honest gating as translation — only a
        # trained decoder may replace the schema-exact template summary
        # (models/summarizer.py). Random-init free text would be noise.
        self._summarizer = None
        if summarizer_params is None:
            summarizer_params = _load_decoder(
                summarizer_path, "OMNIASR_SUMMARIZER", "summarizer", 2)
        if summarizer_params is not None:
            from .models.summarizer import SummaryDecoder

            self._summarizer = SummaryDecoder(cfg, summarizer_params)
        # Dedicated speaker embedder (see the speaker_mode note above).
        # Explicit params/path must load (errors propagate); a discovered
        # release file is best-effort, like the decoders.
        self._xvector = xvector_params
        if self._xvector is None:
            from .models.xvector import load_xvector

            xp = xvector_path or os.getenv("OMNIASR_XVECTOR")
            if xp:
                self._xvector = load_xvector(xp, cfg)
            else:
                xp = _released("xvector")
                if xp:
                    try:
                        self._xvector = load_xvector(xp, cfg)
                    except (KeyError, ValueError):
                        self._xvector = None
        if self._xvector is not None and cfg.encoder.subsample_factor != 4:
            raise ValueError(
                "the x-vector embedder emits frames at 1/4 mel rate; "
                "encoder.subsample_factor must be 4 to align with it")
        if speaker_mode == "auto":
            speaker_mode = ("inline" if self._xvector is not None
                            else "crop")
        self.speaker_mode = speaker_mode

        if params is None:
            if cfg.checkpoint_path:
                from .models.zoo import load_checkpoint

                params = load_checkpoint(cfg.checkpoint_path, cfg)
            else:
                import warnings

                # Honest gating, transcription edition (VERDICT r2 weak #4):
                # with no discovered checkpoint the engine still serves (so
                # tests/benches run anywhere) but the output is byte noise —
                # say so loudly instead of silently, mirroring the
                # translation gating above.
                warnings.warn(
                    "No ASR checkpoint found (checkpoint_path unset and no "
                    "release discovered): serving RANDOM-INIT weights — "
                    "transcriptions will be noise. Pass config.checkpoint_"
                    "path, set OMNIASR_CHECKPOINT, or install a release "
                    "under checkpoints/release/.", stacklevel=2)
                params = asr_init(jax.random.PRNGKey(cfg.seed), cfg)
        # Host copy of the ACTIVE embedder's pooling projection for
        # per-segment embeddings (models/conformer.py
        # pooled_speaker_embed_np) — taken before quantization so the tiny
        # host matmul stays fp32.
        _pool_src = (self._xvector if self._xvector is not None else params)
        self._spk_pool = {
            "spk_proj": jax.tree.map(np.asarray, _pool_src["spk_proj"])}
        specs = asr_param_specs(cfg)
        if quantize:
            # Int8 serving: quantize=True stores int8 dense weights (half
            # the HBM footprint/bandwidth) dequantized into bf16 matmuls;
            # quantize="a8" additionally routes through the Pallas W8A8
            # kernel (int8 x int8 double-rate MXU, v5e+) and "w8" through
            # the W8A16 Pallas kernel. Kernel modes are single-chip only:
            # under tensor parallelism GSPMD partitions the XLA matmul,
            # so the dequant path stays in charge there.
            from .models import layers as _L
            from .ops.quant import quantize_param_tree, quantize_spec_tree

            params = quantize_param_tree(params)
            specs = quantize_spec_tree(specs)
            if quantize in ("a8", "w8"):
                if self.mesh.shape["model"] != 1:
                    raise ValueError(
                        "quantize='a8'/'w8' (Pallas kernels) requires "
                        "model-parallel axis 1; use quantize=True with TP")
        #: Pallas quant-kernel mode; asserted around dispatch (tracing is
        #: lazy, so the layers-module flag is only held while this engine's
        #: program traces/runs — other engines are unaffected).
        self._quant_kernel = quantize if quantize in ("a8", "w8") else None
        if self._xvector is not None:
            # Merged AFTER quantization: the 1 M-param embedder stays
            # full-precision and replicated (sharding it would cost more in
            # collectives than it saves).
            from .models.xvector import xvector_param_specs

            params = dict(params)
            specs = dict(specs)
            params["xvector"] = self._xvector
            specs["xvector"] = xvector_param_specs(self._xvector)
        self.params = shard_params(params, specs, self.mesh)

        # Window geometry.
        fe = cfg.frontend
        self.window_samples = int(window_seconds * fe.sample_rate)
        n_frames = fe.frames_for_samples(self.window_samples)
        self.window_frames = _round_up(
            n_frames, math.lcm(BLOCK_T, cfg.encoder.subsample_factor))
        self.valid_frames = n_frames
        self.frame_dur_s = fe.hop_length * cfg.encoder.subsample_factor / fe.sample_rate
        self.hop_dur_s = fe.hop_length / fe.sample_rate

        n_data = self.mesh.shape["data"]
        self.batch_size = batch_windows_per_device * n_data

        from jax.sharding import NamedSharding, PartitionSpec as P

        samples_sharding = NamedSharding(self.mesh, P("data", None))
        nvalid_sharding = NamedSharding(self.mesh, P("data"))
        param_shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))

        fe_dev = self._frontend
        window_frames = self.window_frames
        n_real_classes = 1 + cfg.vocab.n_bytes

        # Inference config: route attention through the Pallas flash kernel
        # when the subsampled window length tiles its Q blocks.
        import dataclasses as _dc

        from .ops.attention import BLOCK_Q as _FLASH_BLOCK_Q

        t_sub = window_frames // cfg.encoder.subsample_factor
        use_flash = t_sub % _FLASH_BLOCK_Q == 0
        # Fused conv holds one full [T', D] sequence (plus the 2D-wide GLU
        # intermediate and both pointwise weights) in VMEM; only enable
        # when that comfortably fits the ~16 MB budget.
        d = cfg.encoder.d_model
        conv_vmem = 4 * (t_sub * d * 3   # x + out + residual copies
                         + t_sub * 2 * d  # GLU intermediate
                         + d * 2 * d + d * d  # pw1 + pw2
                         + cfg.encoder.conv_kernel * d)
        use_fused_conv = conv_vmem < 12 * 1024 * 1024
        infer_cfg = cfg.replace(encoder=_dc.replace(
            cfg.encoder, use_flash_attention=use_flash,
            use_fused_conv=use_fused_conv))
        flash_interpret = self._frontend.interpret

        def process(params, samples_i16, n_valid_frames, ctc_mask):
            """One fused XLA program: raw samples -> compact head outputs.

            samples_i16: [B, window_samples] int16 (audio ships to the
            device at 2 bytes/sample — lossless for 16-bit sources and half
            the H2D traffic, which profiling shows is the pipeline's
            bottleneck); n_valid_frames: [B] i32.
            Keeping the whole per-batch pipeline in a single jit matters
            doubly on TPU: XLA fuses the frontend into the encoder schedule,
            and the host dispatches one call per batch instead of hundreds
            of eager ops (which would serialize on dispatch latency).
            """
            B = samples_i16.shape[0]
            if samples_i16.dtype == jnp.uint8:   # μ-law wire format
                from .audio.codec import mulaw_decode

                samples = mulaw_decode(samples_i16)
            else:
                samples = samples_i16.astype(jnp.float32) * (1.0 / 32768.0)

            def frames_one(x):
                return fe_dev.frames_from_signal(x)[0]  # [T_pad, n_fft]

            frames_b = jax.vmap(frames_one)(samples)
            T_pad = frames_b.shape[1]
            flat = frames_b.reshape(B * T_pad, cfg.frontend.n_fft)
            mel = log_mel_frames_pallas(flat, fe_dev.cw, fe_dev.sw,
                                        fe_dev.fb, cfg.frontend,
                                        interpret=fe_dev.interpret)
            mel = mel.reshape(B, T_pad, -1)[:, :window_frames]  # [B, T, mels]
            frame_idx = jnp.arange(window_frames)[None, :]
            mask = frame_idx < n_valid_frames[:, None]  # [B, T]
            out = asr_forward(params, mel, mask, infer_cfg,
                              flash_interpret=flash_interpret,
                              # all-to-all MoE dispatch needs the mesh for
                              # its shard_map (parallel/expert_dispatch.py)
                              mesh=self.mesh if
                              infer_cfg.encoder.moe_dispatch == "alltoall"
                              else None)
            # Per-subsampled-frame energy (dB proxy) for host-side VAD
            # trimming (diarization/vad.py): logsumexp over mel bins, mean
            # over the stacking group. Tiny: [B, T'] f32.
            m = mel.astype(jnp.float32)
            e = jax.nn.logsumexp(m, axis=-1) * (10.0 / jnp.log(10.0))
            sub = infer_cfg.encoder.subsample_factor
            e_sub = e.reshape(B, -1, sub).mean(axis=-1)
            # ctc_mask: additive [vocab] mask (orthography constraint,
            # models/orthography.py); all-zeros when unrestricted.
            masked = out["ctc_logits"] + ctc_mask[None, None, :]
            real = masked[..., :n_real_classes]
            ctc_ids = jnp.argmax(real, axis=-1)
            lid_ids = jnp.argmax(out["lid_logits"], axis=-1)
            # Per-frame LID confidence (max posterior) rides along so the
            # host can gate language reporting (DecodeConfig
            # .lid_conf_threshold); f16 on the wire like the features.
            lid_conf = jnp.max(jax.nn.softmax(
                out["lid_logits"].astype(jnp.float32), axis=-1), axis=-1)
            # D2H slimming: the tunnel/PCIe transfer of head outputs is the
            # end-to-end bottleneck (speaker_frames alone is 1 KB/frame at
            # f32). Ids fit in i16 (vocab 512, languages 2048); per-frame
            # features ship as f16 — the host recasts to f32 before any
            # math, so pooling/argmax semantics are unchanged at ~1e-3
            # relative input error. Halves the return payload.
            spk_frames = out["speaker_frames"]
            if "xvector" in params:
                # Local-receptive-field embedder on the SAME mel — frame
                # speaker identity that cannot smear across turns, at
                # ~1 M extra params of compute (models/xvector.py).
                from .models.xvector import xvector_frames

                spk_frames = xvector_frames(params["xvector"], mel, mask)
            # Optional wire slimming for the largest payload (decode knobs;
            # defaults are off/f16 — flipped only on measured DER parity).
            stride = max(1, cfg.decode.spk_frame_stride)
            if stride > 1:
                T2 = spk_frames.shape[1] // stride
                spk_frames = spk_frames[:, :T2 * stride].reshape(
                    B, T2, stride, spk_frames.shape[-1]).mean(axis=2)
            ret = {
                "ctc_ids": ctc_ids.astype(jnp.int16),
                "lid_ids": lid_ids.astype(jnp.int16),
                "lid_conf": lid_conf.astype(jnp.float16),
                "emotion_logits": out["emotion_logits"].astype(jnp.float16),
                "frame_energy": e_sub.astype(jnp.float16),
                "mask": out["mask"],
            }
            if cfg.decode.spk_wire == "i8":
                scale = (jnp.max(jnp.abs(spk_frames), axis=-1, keepdims=True)
                         .astype(jnp.float32) / 127.0 + 1e-12)
                q = jnp.clip(jnp.round(spk_frames.astype(jnp.float32) / scale),
                             -127, 127).astype(jnp.int8)
                ret["speaker_frames_q"] = q
                ret["speaker_scale"] = scale[..., 0].astype(jnp.float16)
            else:
                ret["speaker_frames"] = spk_frames.astype(jnp.float16)
            if cfg.decode.beam_size > 1:
                # Prefix beam search runs on host (ops/beam.py) over the
                # per-frame top-K classes; ship the compact [B,T',K] slices.
                K = min(8, n_real_classes)
                logp = jax.nn.log_softmax(real.astype(jnp.float32), axis=-1)
                topk_lp, topk_ids = jax.lax.top_k(logp, K)
                ret["ctc_topk_logp"] = topk_lp
                ret["ctc_topk_ids"] = topk_ids.astype(jnp.int16)
            if self._states_consumer:
                # Encoder states feed the audio-conditioned translation /
                # summary decoders; only pulled to host when one is enabled
                # (12+ MB per batch). A TEXT-mode translator reads the
                # transcript instead, so it never forces this D2H.
                # f16 on the wire; decoders upcast on host
                ret["encoder_states"] = out["encoder_states"].astype(
                    jnp.float16)
            return ret

        in_shardings = (param_shardings, samples_sharding, nvalid_sharding,
                        None)
        if cfg.decode.wire_pack:
            # One-buffer D2H wire: bitcast-concatenate the whole output
            # tree on device (ops/pack.py) so collecting a batch is a
            # single transfer instead of 7+ round trips over the link.
            from .ops.pack import layout_of, pack_tree

            def process_packed(params, samples_w, n_valid_frames, ctc_mask):
                return pack_tree(process(params, samples_w, n_valid_frames,
                                         ctc_mask))

            wire_dt = jnp.uint8 if self.ingress == "mulaw" else jnp.int16
            spec = jax.eval_shape(
                process, self.params,
                jax.ShapeDtypeStruct((self.batch_size, self.window_samples),
                                     wire_dt),
                jax.ShapeDtypeStruct((self.batch_size,), jnp.int32),
                jax.ShapeDtypeStruct((cfg.vocab.vocab_size,), jnp.float32))
            self._out_layout = layout_of(spec)
            self._process = jax.jit(process_packed, in_shardings=in_shardings)
        else:
            self._out_layout = None
            self._process = jax.jit(process, in_shardings=in_shardings)

    # ------------------------------------------------------------------
    # Health / fault handling (SURVEY §5 failure-detection row)
    # ------------------------------------------------------------------

    def health_check(self) -> dict:
        """Run a trivial program on every mesh device; returns a report.

        The reference's only failure handling is retry-with-backoff around
        the network call (gemini_pipeline.py:717-737); a local engine can
        actively probe its chips."""
        report = {"devices": [], "ok": True}
        for d in self.mesh.devices.flatten():
            try:
                x = jax.device_put(jnp.ones((8, 8)), d)
                val = float(jnp.sum(x * 2.0).block_until_ready())
                ok = abs(val - 128.0) < 1e-3
            except Exception as e:  # noqa: BLE001
                ok = False
                report["error"] = str(e)
            report["devices"].append({"id": str(d), "ok": ok})
            report["ok"] &= ok
        return report

    def _dispatch_batch(self, samples_b, nvalid_b, ctc_mask,
                        max_attempts: int = 2):
        """Dispatch one batch with re-dispatch on device error (transient
        XLA/runtime failures re-run once before surfacing)."""
        from .models import layers as _L

        last = None
        for _ in range(max_attempts):
            try:
                if self._quant_kernel is not None:
                    _L.set_quant_kernel(
                        self._quant_kernel,
                        interpret=jax.default_backend() == "cpu")
                try:
                    return self._process(self.params, samples_b, nvalid_b,
                                         ctc_mask)
                finally:
                    if self._quant_kernel is not None:
                        _L.set_quant_kernel(None)
            except jax.errors.JaxRuntimeError as e:  # pragma: no cover
                last = e
        raise last

    # ------------------------------------------------------------------
    # Feature + forward plumbing
    # ------------------------------------------------------------------

    def _load_audio(self, audio_path: Path) -> np.ndarray:
        target = self.config.frontend.sample_rate
        # Fast path: native decode + resample in one in-process C++ call.
        from .audio.native_lib import native_available, native_decode

        if native_available():
            out = native_decode(audio_path, target_sr=target)
            if out is not None:
                return out[0]
        samples, sr = decode_audio(audio_path)
        if sr != target:
            samples = resample(samples, sr, target)
        return samples

    def _stream_windows_wav(self, audio_path: Path):
        """Lazy window stream over a PCM-16 WAV at the engine sample rate.

        Returns (window_iter, n_windows, n_samples_last, duration_s) or
        None when the file needs full decode (non-WAV container, wrong
        rate/format). Long files spend ~50 s of a 275 s 9.5 h run in host
        decode (evals/r3/long.json); streaming the windows lets
        _forward_batches pull them during dispatch, so decode rides UNDER
        the device forward instead of in front of it (VERDICT r3 #4).
        """
        import wave

        sr = self.config.frontend.sample_rate
        try:
            w = wave.open(str(audio_path), "rb")
        except Exception:
            return None
        try:
            if (w.getcomptype() != "NONE" or w.getsampwidth() != 2
                    or w.getframerate() != sr or w.getnchannels() < 1):
                w.close()
                return None
            n_channels = w.getnchannels()
            n_frames = w.getnframes()
        except Exception:
            w.close()
            return None
        if n_frames <= 0:
            w.close()
            return None
        ws = self.window_samples
        n_windows = (n_frames + ws - 1) // ws
        n_samples_last = n_frames - (n_windows - 1) * ws

        def gen():
            try:
                for i in range(n_windows):
                    raw = w.readframes(ws)
                    x = np.frombuffer(raw, dtype="<i2")
                    if n_channels > 1:
                        x = x.reshape(-1, n_channels).mean(
                            axis=1).astype(np.int16)
                    # Windows stay int16 end-to-end: the i16 ingress ships
                    # them verbatim (no f32 round trip — two 7.7 MB/batch
                    # host conversions saved on the serving hot path).
                    row = x
                    if len(row) < ws:
                        row = np.pad(row, (0, ws - len(row)))
                    yield (i * ws / sr, row)
            finally:
                w.close()

        return gen(), n_windows, n_samples_last, n_frames / sr

    def _windows(self, samples: np.ndarray) -> List[Tuple[float, np.ndarray]]:
        """Cut samples into fixed windows: [(offset_seconds, window_samples)]."""
        sr = self.config.frontend.sample_rate
        out = []
        n = len(samples)
        if n == 0:
            return out
        for start in range(0, n, self.window_samples):
            w = samples[start:start + self.window_samples]
            if len(w) < self.window_samples:
                w = np.pad(w, (0, self.window_samples - len(w)))
            out.append((start / sr, w))
        return out

    def _forward_windows(self, windows: Sequence[Tuple[float, np.ndarray]],
                         n_samples_last: int,
                         orthography: Optional[str] = None,
                         batch_progress=None):
        """Run all windows through mel + encoder in fixed-size batches.

        Returns a list of per-window host dicts with numpy outputs trimmed
        to valid (subsampled) frames. batch_progress(done, total) fires as
        each device batch completes (feeds fractional step-1 progress on the
        SSE routes)."""
        results = []
        for outs in self._forward_batches(windows, n_samples_last,
                                          orthography,
                                          batch_progress=batch_progress):
            results.extend(outs)
        return results

    def _forward_batches(self, windows: Sequence[Tuple[float, np.ndarray]],
                         n_samples_last: int,
                         orthography: Optional[str] = None,
                         batch_progress=None,
                         n_windows: Optional[int] = None):
        """Generator over device batches: yields a list of per-window host
        dicts per completed batch.

        The single dispatch loop behind both transcribe() and
        transcribe_streaming() (they previously maintained two copies —
        VERDICT r1). All batches are dispatched asynchronously up front so
        H2D transfer and compute of batch k+1 overlap collection of batch k.

        ``windows`` may be a LAZY iterable (the streaming-decode long-file
        path): pass ``n_windows`` and the dispatch loop pulls windows as it
        goes, overlapping host audio decode with device compute of the
        already-dispatched batches.
        """
        cfg = self.config
        B = self.batch_size
        n_win = n_windows if n_windows is not None else len(windows)
        win_iter = iter(windows)

        # Per-window valid frame counts (last window may be partial).
        def frames_for(i: int) -> int:
            n_s = n_samples_last if i == n_win - 1 else self.window_samples
            return min(cfg.frontend.frames_for_samples(n_s),
                       self.window_frames)

        from .models.orthography import ctc_logit_mask

        ctc_mask = jnp.asarray(ctc_logit_mask(orthography, cfg.vocab))

        # Phase 1: dispatch every batch without syncing — JAX's async
        # dispatch overlaps H2D transfer and compute of batch k+1 with
        # batch k (the tunnel/PCIe transfer is the bottleneck, not FLOPs).
        pending = []
        for b0 in range(0, n_win, B):
            batch = [next(win_iter) for _ in range(min(B, n_win - b0))]
            sample_rows = [w for _, w in batch]
            n_valid = [frames_for(b0 + k) for k in range(len(batch))]
            while len(sample_rows) < B:  # pad batch to static size
                sample_rows.append(np.zeros_like(sample_rows[0]))
                n_valid.append(0)
            rows = np.stack(sample_rows)
            if self.ingress == "mulaw":
                from .audio.codec import mulaw_encode

                if rows.dtype == np.int16:
                    rows = rows.astype(np.float32) * (1.0 / 32768.0)
                rows_wire = mulaw_encode(rows)
            elif rows.dtype == np.int16:
                rows_wire = rows   # streamed PCM windows: already wire-ready
            else:
                rows_wire = np.clip(rows * 32768.0,
                                    -32768, 32767).astype(np.int16)
            samples_b = jnp.asarray(rows_wire)
            nvalid_b = jnp.asarray(np.asarray(n_valid, np.int32))
            pending.append(
                (batch, self._dispatch_batch(samples_b, nvalid_b, ctc_mask)))

        # Phase 2: collect to host, one completed batch at a time.
        n_batches = len(pending)
        for bi, (batch, out) in enumerate(pending):
            if self._out_layout is not None:
                # Packed wire: ONE D2H pull, then zero-copy host views.
                from .ops.pack import unpack_buffer

                out = unpack_buffer(np.asarray(out), self._out_layout)
            ctc = np.asarray(out["ctc_ids"])
            lid = np.asarray(out["lid_ids"])
            lconf = np.asarray(out["lid_conf"], dtype=np.float32)
            emo = np.asarray(out["emotion_logits"], dtype=np.float32)
            if "speaker_frames_q" in out:
                spk = (np.asarray(out["speaker_frames_q"], dtype=np.float32)
                       * np.asarray(out["speaker_scale"],
                                    dtype=np.float32)[..., None])
            else:
                spk = np.asarray(out["speaker_frames"], dtype=np.float32)
            sub_mask = np.asarray(out["mask"])
            stride = max(1, cfg.decode.spk_frame_stride)
            if stride > 1:
                # Restore the frame rate by repetition (pooling halved it);
                # pad the tail frames lost to the floor division.
                spk = np.repeat(spk, stride, axis=1)
                short = sub_mask.shape[1] - spk.shape[1]
                if short > 0:
                    spk = np.concatenate(
                        [spk, np.repeat(spk[:, -1:], short, axis=1)], axis=1)
            enc = (np.asarray(out["encoder_states"], dtype=np.float32)
                   if "encoder_states" in out else None)
            tk_lp = (np.asarray(out["ctc_topk_logp"], dtype=np.float32)
                     if "ctc_topk_logp" in out else None)
            tk_id = (np.asarray(out["ctc_topk_ids"])
                     if "ctc_topk_ids" in out else None)
            energy = np.asarray(out["frame_energy"], dtype=np.float32)
            outs = []
            spk_src = "xvector" if self._xvector is not None else "trunk"
            for k in range(len(batch)):
                nf_sub = int(sub_mask[k].sum())
                outs.append({
                    "offset_s": batch[k][0],
                    "spk_embedder": spk_src,
                    "ctc_ids": ctc[k, :nf_sub],
                    "lid_ids": lid[k, :nf_sub],
                    "lid_conf": lconf[k, :nf_sub],
                    "emotion_logits": emo[k, :nf_sub],
                    "speaker_frames": spk[k, :nf_sub],
                    "frame_energy": energy[k, :nf_sub],
                    "encoder_states": (enc[k, :nf_sub]
                                       if enc is not None else None),
                    "ctc_topk": ((tk_lp[k, :nf_sub], tk_id[k, :nf_sub])
                                 if tk_lp is not None else None),
                })
            if batch_progress:
                batch_progress(bi + 1, n_batches)
            yield outs

    # ------------------------------------------------------------------
    # Per-segment speaker re-embedding (speaker_mode="crop")
    # ------------------------------------------------------------------

    def _crop_speaker_fn(self):
        """Lazy jit: [B, crop_samples] i16 -> per-frame speaker features.

        A compact second forward used only for diarization: each decoded
        segment's audio is embedded in isolation so no other speaker's
        frames can attend into it (see speaker_mode in __init__)."""
        if getattr(self, "_spk_crop", None) is not None:
            return self._spk_crop
        import dataclasses as _dc

        cfg = self.config
        fe_dev = self._frontend
        crop_samples = int(SPK_CROP_SECONDS * cfg.frontend.sample_rate)
        n_frames = cfg.frontend.frames_for_samples(crop_samples)
        crop_frames = _round_up(
            n_frames, math.lcm(BLOCK_T, cfg.encoder.subsample_factor))
        # Small sequence: plain attention/conv (the Pallas flash kernel's
        # block sizes are tuned for the 30 s window, not a 6 s crop).
        infer_cfg = cfg.replace(encoder=_dc.replace(
            cfg.encoder, use_flash_attention=False, use_fused_conv=False))
        mesh = (self.mesh if infer_cfg.encoder.moe_dispatch == "alltoall"
                else None)
        use_xvector = self._xvector is not None

        def spk_fwd(params, samples_i16, n_valid):
            samples = samples_i16.astype(jnp.float32) * (1.0 / 32768.0)
            frames_b = jax.vmap(
                lambda x: fe_dev.frames_from_signal(x)[0])(samples)
            B, T_pad, n_fft = frames_b.shape
            mel = log_mel_frames_pallas(
                frames_b.reshape(B * T_pad, n_fft), fe_dev.cw, fe_dev.sw,
                fe_dev.fb, cfg.frontend, interpret=fe_dev.interpret)
            mel = mel.reshape(B, T_pad, -1)[:, :crop_frames]
            mask = jnp.arange(crop_frames)[None, :] < n_valid[:, None]
            if use_xvector:
                # Active embedder is the x-vector: skip the trunk entirely
                # (~1 M params vs the full encoder per crop).
                from .models.conformer import subsampled_mask
                from .models.xvector import xvector_frames

                fr = xvector_frames(params["xvector"], mel, mask)
                m = subsampled_mask(mask, cfg.encoder.subsample_factor)
            else:
                out = asr_forward(params, mel, mask, infer_cfg, mesh=mesh)
                fr, m = out["speaker_frames"], out["mask"]
            return {"speaker_frames": fr.astype(jnp.float16), "mask": m}

        self._spk_crop = (jax.jit(spk_fwd), crop_samples, crop_frames)
        return self._spk_crop

    def _segment_crop_embeds(self, samples: np.ndarray,
                             decoded) -> np.ndarray:
        """Pooled speaker embedding per decoded segment, each from its own
        isolated forward pass over the (center-cropped) segment audio."""
        from .models import layers as _L

        fn, crop_samples, crop_frames = self._crop_speaker_fn()
        cfg = self.config
        sr = cfg.frontend.sample_rate
        B = 16
        rows, nvalid = [], []
        n_total = len(samples)
        for s in decoded:
            a = max(0, min(int(s.start * sr), n_total))
            b = max(a, min(int(s.end * sr), n_total))
            if b - a > crop_samples:   # center crop of long segments
                mid = (a + b) // 2
                a = max(0, mid - crop_samples // 2)
                b = a + crop_samples
            row = np.zeros(crop_samples, np.float32)
            row[:b - a] = samples[a:b]
            rows.append(row)
            nvalid.append(min(cfg.frontend.frames_for_samples(max(b - a, 1)),
                              crop_frames))
        embeds = []
        for b0 in range(0, len(rows), B):
            chunk = rows[b0:b0 + B]
            nv = nvalid[b0:b0 + B]
            n_live = len(chunk)
            while len(chunk) < B:
                chunk.append(np.zeros(crop_samples, np.float32))
                nv.append(0)
            wire = np.clip(np.stack(chunk) * 32768.0,
                           -32768, 32767).astype(np.int16)
            if self._quant_kernel is not None:
                _L.set_quant_kernel(self._quant_kernel,
                                    interpret=jax.default_backend() == "cpu")
            try:
                out = fn(self.params, jnp.asarray(wire),
                         jnp.asarray(np.asarray(nv, np.int32)))
            finally:
                if self._quant_kernel is not None:
                    _L.set_quant_kernel(None)
            spk = np.asarray(out["speaker_frames"], np.float32)
            msk = np.asarray(out["mask"], np.float32)
            for k in range(n_live):
                w = msk[k]
                if w.sum() < 1.0:
                    w = np.ones_like(w)
                embeds.append(pooled_speaker_embed_np(
                    self._spk_pool, spk[k], w))
        return np.stack(embeds)

    # ------------------------------------------------------------------
    # Sequence-parallel long-audio mode (long_mode="sequence")
    # ------------------------------------------------------------------

    def _sequence_fns(self):
        """Lazy-built jits for sequence mode: (mel_chunks, sp_decode)."""
        if getattr(self, "_seq_fns", None) is not None:
            return self._seq_fns
        import dataclasses as _dc
        from functools import partial

        from .parallel.sequence import sp_conformer_forward

        cfg = self.config
        # Pre-emphasis runs over the whole file on host (one numpy op), so
        # the chunked device framing is exactly the contiguous framing.
        fe_nopre = MelFrontend(_dc.replace(cfg.frontend, preemphasis=0.0))
        chunk_frames = self.window_samples // cfg.frontend.hop_length

        def mel_chunks(chunks):
            """[C, chunk+overlap samples] f32 -> [C*chunk_frames, n_mels]."""
            frames = jax.vmap(
                lambda x: fe_nopre.frames_from_signal(x)[0])(chunks)
            C, T_pad, n_fft = frames.shape
            mel = log_mel_frames_pallas(
                frames.reshape(C * T_pad, n_fft), fe_nopre.cw, fe_nopre.sw,
                fe_nopre.fb, cfg.frontend, interpret=fe_nopre.interpret)
            mel = mel.reshape(C, T_pad, -1)[:, :chunk_frames]
            return mel.reshape(C * chunk_frames, -1)

        sub = cfg.encoder.subsample_factor
        n_real_classes = 1 + cfg.vocab.n_bytes

        # Emit encoder states only when a decoder needs them (audio-mode
        # translation / neural summary); they are the one non-frame-compact
        # output. Text-mode translators read the transcript, not states.
        want_states = self._states_consumer

        @partial(jax.jit, static_argnums=())
        def sp_decode(params, mel, mask, ctc_mask):
            out = sp_conformer_forward(params, mel, mask, cfg, self.mesh,
                                       axis="data", all_heads=True,
                                       with_states=want_states)
            masked = out["ctc_logits"] + ctc_mask[None, :]
            ctc_ids = jnp.argmax(masked[..., :n_real_classes], axis=-1)
            lid_ids = jnp.argmax(out["lid_logits"], axis=-1)
            lid_conf = jnp.max(jax.nn.softmax(
                out["lid_logits"].astype(jnp.float32), axis=-1), axis=-1)
            # per-subsampled-frame energy proxy, as in the windowed path
            e = jax.nn.logsumexp(mel.astype(jnp.float32), axis=-1) \
                * (10.0 / jnp.log(10.0))
            e_sub = e.reshape(-1, sub).mean(axis=-1)
            res = {
                "ctc_ids": ctc_ids.astype(jnp.int32),
                "lid_ids": lid_ids.astype(jnp.int32),
                "lid_conf": lid_conf,
                "emotion_logits": out["emotion_logits"],
                "speaker_frames": out["speaker_frames"],
                "frame_energy": e_sub,
                "mask": out["mask"],
            }
            if want_states:
                res["encoder_states"] = out["encoder_states"]
            return res

        self._seq_fns = (jax.jit(mel_chunks), sp_decode)
        return self._seq_fns

    def _forward_sequence(self, samples: np.ndarray,
                          orthography: Optional[str] = None):
        """Whole file as ONE mesh-sharded sequence (SURVEY §2b SP row).

        Mel is computed exactly (host pre-emphasis + hop-aligned chunks with
        win-hop right overlap, so chunk framing == contiguous framing); the
        encoder runs once via ring attention over the 'data' axis — no
        window boundaries, hence none of the reference's chunk-merge
        artifacts (gemini_pipeline.py:643-678)."""
        from .models.orthography import ctc_logit_mask

        cfg = self.config
        fe = cfg.frontend
        mel_chunks, sp_decode = self._sequence_fns()

        hop, win = fe.hop_length, fe.win_length
        n = len(samples)
        n_frames_total = fe.frames_for_samples(n)
        if n_frames_total <= 0:
            return []
        # host pre-emphasis over the contiguous signal
        x = np.asarray(samples, np.float32)
        x_pe = np.concatenate([x[:1], x[1:] - fe.preemphasis * x[:-1]])
        overlap = win - hop
        cs = self.window_samples  # hop-aligned chunk length
        chunks = []
        for start in range(0, n, cs):
            c = x_pe[start:start + cs + overlap]
            if len(c) < cs + overlap:
                c = np.pad(c, (0, cs + overlap - len(c)))
            chunks.append(c)
        mel = np.asarray(mel_chunks(jnp.asarray(np.stack(chunks))))
        mel = mel[:n_frames_total]

        # pad frames so T divides n_dev * sub
        n_dev = self.mesh.shape["data"]
        sub = cfg.encoder.subsample_factor
        T = _round_up(max(n_frames_total, 1), n_dev * sub * 2)
        if mel.shape[0] < T:
            mel = np.pad(mel, ((0, T - mel.shape[0]), (0, 0)))
        else:
            mel = mel[:T]
        mask = np.arange(T) < n_frames_total

        ctc_mask = jnp.asarray(ctc_logit_mask(orthography, cfg.vocab))
        from jax.sharding import NamedSharding, PartitionSpec as P

        mel_dev = jax.device_put(
            jnp.asarray(mel), NamedSharding(self.mesh, P("data", None)))
        mask_dev = jax.device_put(
            jnp.asarray(mask), NamedSharding(self.mesh, P("data")))
        out = sp_decode(self.params, mel_dev, mask_dev, ctc_mask)

        nf_sub = int(np.asarray(out["mask"]).sum())
        # Encoder states feed translation/summary decoders; fetching them is
        # the one D2H cost that scales with file length (bf16, [T', D]).
        # Fetch in ~64 MB device-side slices: same total bytes, bounded
        # peak transfer, and no 1-hour ceiling (VERDICT r2: the old cap
        # silently dropped decoder heads on exactly the files sequence
        # mode exists for). A 12 h host-RAM guard stays, loudly.
        enc_states = None
        if "encoder_states" in out:
            max_state_frames = int(12 * 3600.0 / self.frame_dur_s)
            if nf_sub <= max_state_frames:
                enc = out["encoder_states"]
                chunk = max(1, (32 << 20) // max(1, 2 * enc.shape[-1]))
                parts = [
                    np.asarray(jax.device_get(enc[i0:min(i0 + chunk,
                                                         nf_sub)]),
                               dtype=np.float32)
                    for i0 in range(0, nf_sub, chunk)]
                enc_states = np.concatenate(parts, axis=0) \
                    if len(parts) > 1 else parts[0]
            else:
                import warnings

                warnings.warn(
                    f"sequence mode: file has {nf_sub} encoder frames "
                    f"(> {max_state_frames}); translation/neural summary "
                    "are skipped for this file — use window mode for "
                    "decoder heads on very long audio.", stacklevel=2)
        return [{
            "offset_s": 0.0,
            "ctc_ids": np.asarray(out["ctc_ids"])[:nf_sub],
            "lid_ids": np.asarray(out["lid_ids"])[:nf_sub],
            "lid_conf": np.asarray(out["lid_conf"],
                                   dtype=np.float32)[:nf_sub],
            "emotion_logits": np.asarray(out["emotion_logits"],
                                         dtype=np.float32)[:nf_sub],
            "speaker_frames": np.asarray(out["speaker_frames"],
                                         dtype=np.float32)[:nf_sub],
            "frame_energy": np.asarray(out["frame_energy"],
                                       dtype=np.float32)[:nf_sub],
            "encoder_states": enc_states,
            "ctc_topk": None,
        }]

    # ------------------------------------------------------------------
    # Host-side assembly
    # ------------------------------------------------------------------

    def _extract_windows(self, window_outs, decoded=None, seg_meta=None,
                         embedders=None, states=None):
        """Per-window host extraction: segmentation, pooling, beam rescore.

        Incremental by design: the pipelined transcribe() calls this on each
        completed device batch WHILE later batches still compute, so this
        host work (the bulk of the old monolithic assemble stage) overlaps
        the forward instead of following it (VERDICT r3 #4). Returns
        (decoded, seg_meta, embedders, states); pass the previous values
        back in to accumulate."""
        cfg = self.config
        decoded = decoded if decoded is not None else []
        seg_meta = seg_meta if seg_meta is not None else []
        embedders = embedders if embedders is not None else set()
        states = states if states is not None else []

        for w in window_outs:
            embedders.add(w.get("spk_embedder", "trunk"))
            if w.get("encoder_states") is not None:
                states.append(w["encoder_states"])
            segs = segments_from_alignment(
                w["ctc_ids"], self.frame_dur_s, cfg.vocab, cfg.decode,
                time_offset_s=w["offset_s"])
            # Window noise floor for speech-weighted pooling (VAD row of
            # SURVEY §2b): embeddings pooled over speech frames only.
            energy = w.get("frame_energy")
            floor = (np.percentile(energy, 10.0)
                     if energy is not None and len(energy) else None)
            for s in segs:
                f0, f1 = s.frame_start, s.frame_end
                emo_mean = w["emotion_logits"][f0:f1].mean(axis=0)
                spk_span = w["speaker_frames"][f0:f1]
                # Statistics pooling (mean+std) + trained projection — the
                # x-vector recipe the speaker branch is trained with
                # (models/conformer.py pooled_speaker_embed), speech-weighted
                # by the window noise floor.
                if floor is not None:
                    weights = (energy[f0:f1] > floor + 6.0).astype(np.float32)
                    if not weights.any():
                        weights = np.ones(len(spk_span), np.float32)
                else:
                    weights = np.ones(len(spk_span), np.float32)
                spk_mean = pooled_speaker_embed_np(
                    self._spk_pool, spk_span, weights)
                lid_frames = w["lid_ids"][f0:f1]
                lid_conf = (w["lid_conf"][f0:f1]
                            if w.get("lid_conf") is not None else None)
                enc_span = (w["encoder_states"][f0:f1]
                            if w.get("encoder_states") is not None else None)
                if w.get("ctc_topk") is not None:
                    # Beam rescoring: prefix beam over the segment's frames
                    # replaces the greedy text (timestamps/words stay from
                    # the greedy alignment).
                    text = self._beam_text(w["ctc_topk"], f0, f1)
                    if text:
                        s.text = text
                decoded.append(s)
                seg_meta.append((emo_mean, spk_mean, (lid_frames, lid_conf),
                                 enc_span))
        return decoded, seg_meta, embedders, states

    def _assemble(self, window_outs, *, language: Optional[str],
                  speaker_count: Optional[str],
                  duration_s: float,
                  samples: Optional[np.ndarray] = None
                  ) -> TranscriptionResult:
        parts = self._extract_windows(window_outs)
        return self._assemble_global(parts, language=language,
                                     speaker_count=speaker_count,
                                     duration_s=duration_s, samples=samples)

    def _assemble_global(self, parts, *, language: Optional[str],
                         speaker_count: Optional[str],
                         duration_s: float,
                         samples: Optional[np.ndarray] = None
                         ) -> TranscriptionResult:
        """Whole-file assembly over pre-extracted window parts: speaker
        clustering, language/emotion aggregation, translation, summary."""
        cfg = self.config
        decoded, seg_meta, embedders, states = parts
        lang_hint_id = lang_table.id_for_language(language) if language else -1

        # Sub-stage wall times, merged into the trace as "assemble.<k>" by
        # transcribe() — the 9.5 h envelope is assemble-bound and the split
        # (cluster vs segments vs translate vs summary) decides what to
        # optimize (evals/r5/long.json: assemble 104 s of a 236 s wall).
        import time as _time_mod

        prof: Dict[str, float] = {}
        self._assemble_prof = prof
        _t0 = _time_mod.perf_counter()

        def _mark(name: str) -> None:
            nonlocal _t0
            now = _time_mod.perf_counter()
            prof[name] = prof.get(name, 0.0) + (now - _t0)
            _t0 = now

        if not decoded:
            return TranscriptionResult(summary=None, segments=[],
                                       detected_languages=None)

        # --- speakers: global clustering (consistent across chunks) ---
        n_clusters = None
        if speaker_count:
            try:
                n_clusters = max(1, int(str(speaker_count).strip()))
            except ValueError:
                n_clusters = None
        active = "xvector" if self._xvector is not None else "trunk"
        # Inline pooling is only valid when the window outputs carry the
        # active embedder's frames (the sequence path emits trunk frames,
        # so with an x-vector loaded it falls back to crop re-embedding).
        outs_match = embedders <= {active}
        want_crop = (self.speaker_mode == "crop"
                     or (self.speaker_mode == "inline" and not outs_match))
        used_crop = False
        if want_crop and samples is not None and len(decoded) > 1:
            # Re-embed every segment in isolation (see __init__ docnote:
            # in-context trunk frame embeddings collapse across speakers).
            embeds = self._segment_crop_embeds(samples, decoded)
            used_crop = True
        else:
            embeds = np.stack([m[1] for m in seg_meta])
        th = cfg.decode.ahc_threshold
        if th is None:
            # Measured operating points per embedder/pooling combination
            # (tools/diag_diar.py, eval_diar.py): crop-trunk embeddings
            # separate sharply (~0.03/0.54 same/diff) -> low cut; inline
            # trunk embeddings barely separate -> conservative default.
            if active == "xvector":
                th = XVECTOR_AHC_THRESHOLD
            elif used_crop:
                th = 0.22
            else:
                th = CLUSTER_DEFAULT_THRESHOLD
        from .diarization.cluster import cluster_speakers

        labels = cluster_speakers(embeds, n_clusters=n_clusters,
                                  threshold=th,
                                  count_mode=cfg.decode.count_mode,
                                  resegment=cfg.decode.resegment)
        _mark("cluster")

        # --- languages + emotions per segment ---
        segments: List[TranscriptSegment] = []
        all_languages: List[dict] = []
        seen_codes = set()
        emotion_counts = np.zeros(len(EMOTIONS))

        for s, (emo_mean, _, (lid_frames, lid_conf), _), lab in zip(
                decoded, seg_meta, labels):
            langs = self._segment_languages(lid_frames, lid_conf,
                                            lang_hint_id)
            primary = langs[0] if langs else {"name": None, "code": None}
            # Global language aggregation, first-appearance order, deduped by
            # code (reference parse semantics, gemini_pipeline.py:412-419).
            for lg in langs:
                if lg["code"] and lg["code"] not in seen_codes:
                    seen_codes.add(lg["code"])
                    all_languages.append(
                        {"code": lg["code"], "language": lg["name"]})
            emo_idx = int(np.argmax(emo_mean[: len(EMOTIONS)]))
            # Overall tone: duration-weighted probability mass, not a
            # per-segment argmax vote — over-segmentation of one long turn
            # must not outvote the conversation, and weakly-classified
            # segments should count less (VERDICT r3 #8: tone-fact acc).
            logits = emo_mean[: len(EMOTIONS)].astype(np.float64)
            p = np.exp(logits - logits.max())
            p /= p.sum()
            emotion_counts += max(s.end - s.start, 1e-3) * p
            segments.append(TranscriptSegment(
                start=round(s.start, 3),
                end=round(s.end, 3),
                speaker=f"Speaker {int(lab) + 1}",
                text=s.text,
                language=primary["name"],
                language_code=primary["code"],
                languages=langs,
                emotion=EMOTIONS[emo_idx],
                translation=None,  # filled by _translate_segments below when
                #                    a trained decoder is loaded; None is
                #                    schema-valid (null iff English, reference
                #                    gemini_pipeline.py:176-179)
                words=s.words,
            ))
        _mark("segments")

        if self._translator is not None:
            self._translate_segments(segments, seg_meta)
        _mark("translate")

        n_speakers = int(labels.max()) + 1 if len(labels) else 0
        top_emotion = EMOTIONS[int(np.argmax(emotion_counts))]
        # Summary must mention speaker count + overall tone (prompt
        # requirement #7, reference gemini_pipeline.py:210).
        from .models.summarizer import template_summary

        summary = template_summary(
            duration_s=duration_s, n_speakers=n_speakers,
            n_segments=len(segments),
            language_names=[l["language"] for l in all_languages],
            top_emotion=top_emotion)
        if self._summarizer is not None:
            # Trained free-text summarizer (reference summaries are free
            # text, gemini_pipeline.py:126-129); template is the fallback.
            # The generated text replaces the template ONLY when it agrees
            # with the engine's own computed facts — on out-of-distribution
            # audio the decoder can emit fluent-but-wrong (or degenerate)
            # claims, and the template states what the heads actually found.
            from .models.summarizer import summary_consistent

            if states:
                # Fact-conditioned checkpoints read the engine's own
                # metadata as a forced decode prefix (summarizer.py);
                # unconditioned checkpoints ignore `facts`.
                neural = self._summarizer.summarize(states, facts={
                    "n_speakers": n_speakers,
                    "tone": top_emotion,
                    "language_names": [l["language"]
                                       for l in all_languages]})
                if neural and summary_consistent(
                        neural, n_speakers=n_speakers,
                        tone=top_emotion):
                    summary = neural
        _mark("summary")
        return TranscriptionResult(
            summary=summary,
            segments=segments,
            detected_languages=all_languages if all_languages else None,
        )

    def _decode_lm(self):
        """Lazily built lexicon trie LM for shallow fusion (ops/lexicon.py);
        None when fusion is off (decode.lm_alpha == 0 or no lexicon)."""
        if self.config.decode.lm_alpha == 0.0 or not self.config.decode.lexicon:
            return None
        lm = getattr(self, "_lexicon_lm", None)
        if lm is None:
            from .ops.lexicon import TrieLM, synth_lexicon

            src = self.config.decode.lexicon
            if src == "synth":
                lm = synth_lexicon()
            elif src == "synth_bigram":
                # + word-bigram context from the English sentence bank
                # (ops/lexicon.py BigramTrieLM); cipher languages score
                # identically to the unigram trie
                lm = synth_lexicon(bigram=True)
            else:
                import math

                words = [w.strip() for w in
                         open(src, encoding="utf-8").read().split()]
                lp = -math.log(max(len(words), 1))
                lm = TrieLM((w, lp) for w in words if w)
            self._lexicon_lm = lm
        return lm

    def _beam_text(self, topk, f0: int, f1: int) -> Optional[str]:
        """Prefix-beam rescoring of one segment from top-K frame scores."""
        from .ops.beam import LOG_ZERO, ctc_prefix_beam_search

        lp, ids = topk
        T = f1 - f0
        n_real = 1 + self.config.vocab.n_bytes
        dense = np.full((T, n_real), LOG_ZERO, np.float32)
        rows = np.arange(T)[:, None]
        dense[rows, ids[f0:f1]] = lp[f0:f1]
        beams = ctc_prefix_beam_search(
            dense, beam_size=self.config.decode.beam_size,
            blank_id=self.config.vocab.blank_id, topk=ids.shape[-1],
            lm=self._decode_lm(), lm_alpha=self.config.decode.lm_alpha,
            word_bonus=self.config.decode.lm_word_bonus)
        if not beams:
            return None
        byte_vals = [self.config.vocab.id_to_byte(c) for c in beams[0].prefix]
        return bytes(b for b in byte_vals if 0 <= b < 256).decode(
            "utf-8", errors="replace").strip()

    TRANSLATE_SPAN_FRAMES = 256   # ~10 s of encoder frames per segment
    TRANSLATE_MAX_BYTES = 128

    @property
    def _states_consumer(self) -> bool:
        """True when a decoder head needs host copies of encoder states:
        the neural summarizer, or an AUDIO-conditioned translator. A
        text-mode translator ("src" subtree) reads the transcript."""
        from .models.translation import is_text_translator

        return (self._summarizer is not None
                or (self._translator is not None
                    and not is_text_translator(self._translator)))

    def _translate_segments(self, segments: List[TranscriptSegment],
                            seg_meta) -> None:
        """Fill ``translation`` for non-English segments (prompt
        requirement #5: translation null iff English, reference
        gemini_pipeline.py:176-179, 208).

        Text-mode translators (models/translation.py "src" mode) read each
        segment's TRANSCRIPT — the same factorization as the reference,
        whose LLM translates the text it just transcribed. Audio-mode
        translators cross-attend the segment's encoder states."""
        from .models.translation import (greedy_translate, is_text_translator,
                                         tokens_to_text)

        if is_text_translator(self._translator):
            self._translate_segments_text(segments)
            return
        todo = [i for i, s in enumerate(segments)
                if s.language_code and s.language_code != "en"
                and seg_meta[i][3] is not None]
        if not todo:
            return
        Te, D = self.TRANSLATE_SPAN_FRAMES, self.config.encoder.d_model
        B = 8
        for b0 in range(0, len(todo), B):
            idxs = todo[b0:b0 + B]
            enc = np.zeros((B, Te, D), np.float32)
            mask = np.zeros((B, Te), bool)
            for row, i in enumerate(idxs):
                span = seg_meta[i][3][:Te]
                enc[row, :len(span)] = span
                mask[row, :len(span)] = True
            toks = np.asarray(greedy_translate(
                self._translator, jnp.asarray(enc), jnp.asarray(mask),
                self.config, max_len=self.TRANSLATE_MAX_BYTES,
                n_heads=self.config.encoder.n_heads))
            for row, i in enumerate(idxs):
                text = tokens_to_text(toks[row], self.config.vocab).strip()
                if text:
                    segments[i].translation = text

    def _translate_segments_text(
            self, segments: List[TranscriptSegment]) -> None:
        """Text-mode translation: segment transcript bytes -> English.

        Long transcripts are split on word boundaries into
        MAX_SOURCE_LEN-byte spans, translated independently and joined —
        the lexicon mapping is word-local, so span splits are lossless."""
        from .models.translation import (MAX_SOURCE_LEN, source_to_tokens,
                                         tokens_to_text, translate_text)

        todo = [i for i, s in enumerate(segments)
                if s.language_code and s.language_code != "en"
                and (s.text or "").strip()]
        if not todo:
            return

        def spans(text: str) -> List[str]:
            words, cur, out = text.split(), [], []
            n = 0
            for w in words:
                wb = len(w.encode("utf-8")) + 1
                if cur and n + wb > MAX_SOURCE_LEN:
                    out.append(" ".join(cur))
                    cur, n = [], 0
                cur.append(w)
                n += wb
            if cur:
                out.append(" ".join(cur))
            return out or [""]

        # Memoize by span text: a 9.5 h file yields thousands of segments
        # and repeated short spans translate identically; each cache hit
        # saves a slot in the (sequential, 128-step) decode scan.
        jobs = [(i, sp) for i in todo for sp in spans(segments[i].text)]
        memo: dict = {}
        unique = sorted({sp for _, sp in jobs})
        # B=128 amortizes the scan's sequential latency across segments
        # (the scan runs its 128 steps regardless of batch width).
        B = 128
        for b0 in range(0, len(unique), B):
            batch = unique[b0:b0 + B]
            ids = np.zeros((B, MAX_SOURCE_LEN), np.int32)
            mask = np.zeros((B, MAX_SOURCE_LEN), bool)
            for row, sp in enumerate(batch):
                ids[row], mask[row] = source_to_tokens(sp, self.config.vocab)
            toks = np.asarray(translate_text(
                self._translator, jnp.asarray(ids), jnp.asarray(mask),
                self.config, max_len=self.TRANSLATE_MAX_BYTES,
                n_heads=self.config.encoder.n_heads))
            for row, sp in enumerate(batch):
                memo[sp] = tokens_to_text(toks[row],
                                          self.config.vocab).strip()
        results: dict = {}
        for i, sp in jobs:
            text = memo.get(sp, "")
            if text:
                results.setdefault(i, []).append(text)
        for i, parts in results.items():
            segments[i].translation = " ".join(parts)

    def _segment_languages(self, lid_frames: np.ndarray,
                           lid_conf: Optional[np.ndarray],
                           hint_id: int) -> List[dict]:
        """Primary-first language list for a segment (code-switch aware).

        Frame-level LID votes are tallied; languages holding >20% of frames
        are reported, primary first (schema contract, reference
        gemini_pipeline.py:164-175). A user hint biases ties toward the
        hinted language.

        Confidence gate (VERDICT r2 weak #3): a language only makes the
        list when the mean max-posterior over its frames clears
        ``decode.lid_conf_threshold``. The LID head carries 2048 classes
        but only a fraction have training signal; without the gate an
        untrained softmax confidently asserts a wrong language for any
        out-of-distribution audio. Below the gate the segment falls back
        to the user's hint, or reports no language at all.
        """
        thresh = self.config.decode.lid_conf_threshold
        ids, counts = np.unique(lid_frames, return_counts=True)
        order = np.argsort(-counts)
        total = counts.sum()
        langs = []
        for k in order:
            if counts[k] / total >= 0.2 or not langs:
                if lid_conf is not None and thresh > 0:
                    conf = float(lid_conf[lid_frames == ids[k]].mean())
                    if conf < thresh:
                        continue
                langs.append(lang_table.language_for_id(int(ids[k])))
        if hint_id >= 0:
            hint = lang_table.language_for_id(hint_id)
            codes = [l["code"] for l in langs]
            if hint["code"] in codes:
                langs.insert(0, langs.pop(codes.index(hint["code"])))
            elif not langs:
                # Nothing cleared the gate: trust the caller's hint rather
                # than reporting a confidently wrong untrained class.
                langs = [hint]
        return langs

    # ------------------------------------------------------------------
    # Public API (reference-compatible)
    # ------------------------------------------------------------------

    def transcribe(
        self,
        audio_path,
        *,
        progress_callback: ProgressCallback = None,
        language: Optional[str] = None,
        speaker_count: Optional[str] = None,
        orthography: Optional[str] = None,
    ) -> TranscriptionResult:
        """Transcribe an audio file on-device.

        Same signature, progress steps and result semantics as the reference
        `GeminiASRPipeline.transcribe` (gemini_pipeline.py:474-539), plus the
        serverless variant's ``orthography`` hint (reference
        _gemini.js:86-114) implemented as a hard script constraint on the
        CTC decode (models/orthography.py)."""
        _report, _report_frac = _progress_reporters(progress_callback)

        trace = StageTrace(n_chips=self.mesh.devices.size)
        audio_path = Path(audio_path)
        sr = self.config.frontend.sample_rate
        _report("uploading", 0)       # step 0: host decode + resample

        # Long-file fast path (VERDICT r3 #4): stream PCM windows straight
        # off the container so host decode rides UNDER the device forward
        # (the 9.5 h envelope spent ~50 s in up-front decode). Only when no
        # later stage needs the full sample buffer (crop re-embedding).
        samples = None
        use_stream = False
        if self.long_mode != "sequence" and self.speaker_mode != "crop":
            s = self._stream_windows_wav(audio_path)
            if (s is not None and s[3] >
                    self.config.chunking.min_duration_for_chunking_s):
                win_iter, n_win, n_last, duration_s = s
                use_stream = True
        if not use_stream:
            with trace.stage("decode"):
                samples = self._load_audio(audio_path)
            duration_s = len(samples) / sr
        trace.audio_seconds = duration_s

        _report("transcribing", 1)    # step 1: TPU forward
        if self.long_mode == "sequence":
            with trace.stage("forward"):
                # whole file as ONE mesh-sharded sequence (ring attention) —
                # no window boundaries (VERDICT r1 #3)
                outs = self._forward_sequence(samples,
                                              orthography=orthography)
                _report_frac("transcribing", 1, 1.0)
            _report("processing", 2)  # step 2: host assembly
            with trace.stage("assemble"):
                result = self._assemble(outs, language=language,
                                        speaker_count=speaker_count,
                                        duration_s=duration_s,
                                        samples=samples)
            trace.stages.update(
                {f"assemble.{k}": round(v, 2)
                 for k, v in getattr(self, "_assemble_prof", {}).items()})
        else:
            if not use_stream:
                windows = self._windows(samples)
                n_win = len(windows)
                n_last = (len(samples) - (n_win - 1) * self.window_samples
                          if windows else 0)
                win_iter = windows
            # Pipelined forward + extraction: every device batch is
            # dispatched asynchronously, and per-window host extraction
            # (segmentation/pooling/rescoring — the bulk of the old
            # assemble stage) runs on each completed batch WHILE later
            # batches still compute. "forward" below is time blocked on
            # the device; "extract" is host work that overlapped it.
            parts = None
            t_extract = 0.0
            import time as _time

            with trace.stage("forward"):
                for outs_b in self._forward_batches(
                        win_iter, n_last, orthography=orthography,
                        n_windows=n_win,
                        # fractional step-1 progress per completed device
                        # batch (VERDICT r1 #5)
                        batch_progress=lambda done, total: _report_frac(
                            "transcribing", 1, done / total)):
                    t0 = _time.perf_counter()
                    parts = self._extract_windows(outs_b, *(parts or ()))
                    t_extract += _time.perf_counter() - t0
            trace.stages["forward"] = max(
                0.0, trace.stages.get("forward", 0.0) - t_extract)
            trace.stages["extract"] = t_extract
            _report("processing", 2)  # step 2: whole-file assembly
            with trace.stage("assemble"):
                result = self._assemble_global(
                    parts or ([], [], set(), []), language=language,
                    speaker_count=speaker_count,
                    duration_s=duration_s, samples=samples)
            trace.stages.update(
                {f"assemble.{k}": round(v, 2)
                 for k, v in getattr(self, "_assemble_prof", {}).items()})
        self.last_trace = trace
        trace.log(file=audio_path.name)
        _report("done", 3)
        return result

    def transcribe_streaming(
        self,
        audio_path,
        *,
        language: Optional[str] = None,
        speaker_count: Optional[str] = None,
        orthography: Optional[str] = None,
    ):
        """Generator streaming results as device batches complete.

        Yields ("partial", list[TranscriptSegment]) after each batch — with
        provisional speaker labels from online centroid tracking — and
        finally ("final", TranscriptionResult) with globally-reconciled
        speakers (the same output transcribe() returns). The reference has
        no incremental mode: its SSE stream only carries step numbers until
        the full result lands (reference app.py:210-269).
        """
        cfg = self.config
        samples = self._load_audio(Path(audio_path))
        duration_s = len(samples) / cfg.frontend.sample_rate
        windows = self._windows(samples)
        if not windows:
            yield ("final", TranscriptionResult(summary=None, segments=[],
                                                detected_languages=None))
            return
        n_last = len(samples) - (len(windows) - 1) * self.window_samples

        all_outs = []
        centroids: List[np.ndarray] = []   # online speaker centroids
        counts: List[int] = []

        # Same dispatch loop as transcribe() (_forward_batches) — one code
        # path for both modes; only the incremental assembly differs.
        for outs in self._forward_batches(windows, n_last, orthography):
            partial: List[TranscriptSegment] = []
            for w in outs:
                all_outs.append(w)
                segs = segments_from_alignment(
                    w["ctc_ids"], self.frame_dur_s, cfg.vocab, cfg.decode,
                    time_offset_s=w["offset_s"])
                for s in segs:
                    f0, f1 = s.frame_start, s.frame_end
                    emb = pooled_speaker_embed_np(
                        self._spk_pool, w["speaker_frames"][f0:f1],
                        np.ones(f1 - f0, np.float32))
                    lab = self._online_speaker(
                        emb, centroids, counts,
                        # match the batch path's embedder-aware cut
                        threshold=(XVECTOR_AHC_THRESHOLD
                                   if self._xvector is not None
                                   else CLUSTER_DEFAULT_THRESHOLD))
                    lid_frames = w["lid_ids"][f0:f1]
                    langs = self._segment_languages(
                        lid_frames, w.get("lid_conf")[f0:f1]
                        if w.get("lid_conf") is not None else None, -1)
                    primary = (langs[0] if langs
                               else {"name": None, "code": None})
                    emo_idx = int(np.argmax(
                        w["emotion_logits"][f0:f1].mean(axis=0)[:len(EMOTIONS)]))
                    partial.append(TranscriptSegment(
                        start=round(s.start, 3), end=round(s.end, 3),
                        speaker=f"Speaker {lab + 1}", text=s.text,
                        language=primary["name"],
                        language_code=primary["code"], languages=langs,
                        emotion=EMOTIONS[emo_idx], translation=None,
                        words=s.words))
            yield ("partial", partial)

        yield ("final", self._assemble(
            all_outs, language=language, speaker_count=speaker_count,
            duration_s=duration_s, samples=samples))

    @staticmethod
    def _online_speaker(emb: np.ndarray, centroids: List[np.ndarray],
                        counts: List[int], threshold: float = 0.45) -> int:
        """Assign an embedding to the nearest running centroid (cosine),
        spawning a new speaker past the distance threshold."""
        n = np.linalg.norm(emb) + 1e-9
        e = emb / n
        best, best_d = -1, 1e9
        for i, c in enumerate(centroids):
            d = 1.0 - float(e @ (c / (np.linalg.norm(c) + 1e-9)))
            if d < best_d:
                best, best_d = i, d
        if best >= 0 and best_d < threshold:
            centroids[best] = (centroids[best] * counts[best] + e) / (counts[best] + 1)
            counts[best] += 1
            return best
        centroids.append(e)
        counts.append(1)
        return len(centroids) - 1

    def transcribe_chunked(
        self,
        audio_path,
        *,
        progress_callback: ProgressCallback = None,
        language: Optional[str] = None,
        speaker_count: Optional[str] = None,
        orthography: Optional[str] = None,
    ) -> TranscriptionResult:
        """Long-audio path (reference gemini_pipeline.py:577-682).

        Locally there is nothing to re-dispatch over threads: windows already
        batch over the mesh 'data' axis, and speaker clustering is global, so
        this shares the single-file implementation. Kept as a distinct method
        for API parity and for the chunk-level progress contract.
        """
        return self.transcribe(
            audio_path,
            progress_callback=progress_callback,
            language=language,
            speaker_count=speaker_count,
            orthography=orthography,
        )

    def transcribe_with_retry(
        self,
        audio_path,
        *,
        max_retries: int = 3,
        progress_callback: ProgressCallback = None,
        language: Optional[str] = None,
        speaker_count: Optional[str] = None,
        orthography: Optional[str] = None,
    ) -> TranscriptionResult:
        """Retry wrapper: 3 attempts, 2**attempt backoff, chunked dispatch for
        files > 6 min — exact semantics of reference gemini_pipeline.py:684-741."""
        audio_path = Path(audio_path)
        duration = get_audio_duration(audio_path)
        use_chunking = duration > self.config.chunking.min_duration_for_chunking_s

        last_error: Optional[Exception] = None
        for attempt in range(max_retries):
            try:
                fn = self.transcribe_chunked if use_chunking else self.transcribe
                return fn(
                    audio_path,
                    progress_callback=progress_callback,
                    language=language,
                    speaker_count=speaker_count,
                    orthography=orthography,
                )
            except Exception as e:  # noqa: BLE001 — parity with reference
                last_error = e
                if attempt < max_retries - 1:
                    time.sleep(2 ** attempt)
        raise RuntimeError(
            f"Failed to transcribe after {max_retries} attempts: {last_error}"
        )
