"""Typed configuration for the TPU-native framework.

One config object replaces the reference's scattered module constants
(chunk length / threshold / parallelism, reference gemini_pipeline.py:216-219;
20 MB inline cap :354) and adds everything a local TPU stack needs: mesh
shape, model dims, frontend parameters, and decode parameters.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class FrontendConfig:
    """Log-mel frontend parameters.

    The math mirrors the browser analyzer the reference ships (Hann window,
    HTK mel scale, pre-emphasis; public/static/app.js:2762-2886) at standard
    ASR hyperparameters.
    """

    sample_rate: int = 16_000
    n_fft: int = 1024           # 15.6 Hz bins: keeps the lowest of 128 mel
    #                             filters non-empty; 513 freqs pad to 640 lanes
    win_length: int = 400       # 25 ms @ 16 kHz
    hop_length: int = 160       # 10 ms @ 16 kHz
    n_mels: int = 128           # lane-aligned (128) for TPU tiling
    f_min: float = 0.0
    f_max: Optional[float] = None  # default: sample_rate / 2
    preemphasis: float = 0.97
    log_floor: float = 1e-10

    @property
    def fmax(self) -> float:
        return self.f_max if self.f_max is not None else self.sample_rate / 2.0

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    def frames_for_samples(self, n_samples: int) -> int:
        """Number of STFT frames for a sample count (center=False)."""
        if n_samples < self.win_length:
            return 0
        return 1 + (n_samples - self.win_length) // self.hop_length


@dataclass(frozen=True)
class EncoderConfig:
    """Conformer encoder dimensions. Defaults are TPU-tile aligned."""

    d_model: int = 512
    n_layers: int = 12
    n_heads: int = 8
    ffn_mult: int = 4
    conv_kernel: int = 32
    subsample_factor: int = 4   # two stride-2 convs on the mel axis
    dropout: float = 0.1
    dtype: str = "bfloat16"     # compute dtype; params kept fp32
    use_flash_attention: bool = False  # Pallas blockwise kernel; inference
    #                                    only (no VJP) — engine turns it on
    use_fused_conv: bool = False       # fused Pallas conv module (5x over
    #                                    XLA's depthwise lowering); inference
    #                                    only — engine turns it on
    remat: bool = False         # jax.checkpoint each block: recompute
    #                             activations in backward (memory <-> FLOPs)
    n_experts: int = 0          # >0: second FFN of each block becomes a
    #                             top-1 MoE with experts sharded over 'model'
    moe_dispatch: str = "dense"  # 'dense': expert-sharded dense compute
    #                              (models/moe.py, exact, comm-light);
    #                              'alltoall': capacity-based all-to-all
    #                              token dispatch (parallel/expert_dispatch,
    #                              compute-optimal for large E) — needs the
    #                              mesh threaded into asr_forward
    moe_capacity_factor: float = 2.0  # per-(src,dst) capacity for alltoall

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


@dataclass(frozen=True)
class VocabConfig:
    """Byte-level universal vocabulary.

    Using UTF-8 bytes makes the CTC head language-agnostic across the
    1600+ languages the reference claims (README.md:96-107) with no
    per-language tokenizer: blank=0, bytes 1..256 map byte value b -> id b+1.
    Padded to 512 classes so the logits matmul tiles cleanly on the MXU.
    """

    blank_id: int = 0
    n_bytes: int = 256
    vocab_size: int = 512  # blank + 256 bytes + padding to a lane multiple

    def byte_to_id(self, b: int) -> int:
        return b + 1

    def id_to_byte(self, i: int) -> int:
        return i - 1


@dataclass(frozen=True)
class ChunkingConfig:
    """Long-audio chunking envelope (reference gemini_pipeline.py:216-219)."""

    chunk_duration_s: float = 300.0       # CHUNK_DURATION_SECONDS
    min_duration_for_chunking_s: float = 360.0  # MIN_DURATION_FOR_CHUNKING
    max_parallel_chunks: int = 4          # becomes per-host dispatch width
    overlap_s: float = 0.0                # optional overlap for merge fixes


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh shape. axis order: (data, model)."""

    data: int = -1   # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> Tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else max(1, n_devices // model)
        return data, model


@dataclass(frozen=True)
class DecodeConfig:
    """CTC decode + segmentation parameters."""

    beam_size: int = 1                # 1 = greedy
    lm_alpha: float = 0.3             # shallow-fusion weight for the
    #                                   lexicon trie LM (ops/lexicon.py);
    #                                   0 = acoustic-only. Applies only when
    #                                   beam_size > 1. Default from the
    #                                   offline sweep (evals/r3/
    #                                   lm_sweep_offline.jsonl): synth WER
    #                                   0.058 -> 0.031 at beam 8, flat in
    #                                   alpha over [0.3, 1.0]
    lm_word_bonus: float = 0.0        # per-word insertion bonus (beta)
    lexicon: Optional[str] = "synth"  # "synth" = training-corpus lexicons
    #                                   (+ bundled real-recording vocab);
    #                                   "synth_bigram" adds English
    #                                   word-bigram context from the
    #                                   sentence bank (BigramTrieLM);
    #                                   or a path to a newline word list
    segment_min_s: float = 2.0        # segment granularity contract
    segment_max_s: float = 10.0       # (reference prompt, gemini_pipeline.py:206)
    blank_gap_s: float = 0.35         # blank run length that splits segments
    lid_conf_threshold: float = 0.30  # min mean frame posterior for a
    #                                   language to be reported; below it the
    #                                   segment falls back to the user hint or
    #                                   omits the language (keeps the ~2040
    #                                   untrained LID classes from asserting
    #                                   confidently wrong languages)
    ahc_threshold: Optional[float] = None  # speaker AHC merge distance;
    #                                   None -> engine picks per speaker
    #                                   embedding mode (crop embeddings
    #                                   separate much more cleanly than
    #                                   in-context ones, so the cut differs)
    count_mode: str = "threshold"     # speaker-count stopping rule when no
    #                                   user hint is given: "threshold" =
    #                                   merge while closest pair < cut;
    #                                   "eigengap" = spectral count estimate
    #                                   pins the dendrogram cut
    #                                   (diarization/cluster.py
    #                                   estimate_n_speakers)
    resegment: bool = False           # VBx-style speaker-HMM Viterbi pass
    #                                   over the AHC labels (cluster.py
    #                                   resegment_labels); default flips
    #                                   only on a measured DER win
    wire_pack: bool = True            # pack all per-batch head outputs into
    #                                   ONE uint8 device buffer so each
    #                                   batch costs a single D2H round trip
    #                                   (ops/pack.py — BENCH_r04 put the
    #                                   serving wall at the tunnel link,
    #                                   not FLOPs). Bitcast-exact.
    spk_frame_stride: int = 1         # device-side mean-pool of speaker
    #                                   frames before the wire (2 halves the
    #                                   largest D2H payload; host restores
    #                                   frame rate by repetition). Flip only
    #                                   on measured DER parity.
    spk_wire: str = "f16"             # speaker-frame wire dtype: "f16" or
    #                                   "i8" (per-frame absmax int8 quant,
    #                                   4x smaller; clustering uses cosine
    #                                   distances, which survive it)


@dataclass(frozen=True)
class PipelineConfig:
    """Top-level framework config."""

    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    vocab: VocabConfig = field(default_factory=VocabConfig)
    chunking: ChunkingConfig = field(default_factory=ChunkingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)
    checkpoint_path: Optional[str] = None
    max_retries: int = 3              # reference gemini_pipeline.py:689
    seed: int = 0

    def to_json(self) -> str:
        """Serialize the model-defining fields (release config.json)."""
        import json

        return json.dumps({
            "frontend": dataclasses.asdict(self.frontend),
            "encoder": dataclasses.asdict(self.encoder),
            "vocab": dataclasses.asdict(self.vocab),
        }, indent=1)

    @staticmethod
    def from_json(text: str, **overrides) -> "PipelineConfig":
        """Inverse of :meth:`to_json`; non-model fields take defaults or
        ``overrides``. A release config may additionally carry a partial
        ``decode`` block (tuned operating points — e.g. the AHC merge
        threshold measured for that trunk's speaker embeddings — ship
        beside the weights they were tuned on)."""
        import json

        d = json.loads(text)
        if "decode" in d and "decode" not in overrides:
            overrides["decode"] = DecodeConfig(**d["decode"])
        return PipelineConfig(
            frontend=FrontendConfig(**d.get("frontend", {})),
            encoder=EncoderConfig(**d.get("encoder", {})),
            vocab=VocabConfig(**d.get("vocab", {})),
            **overrides)

    @staticmethod
    def from_env() -> "PipelineConfig":
        """Build a config honoring the reference's env-var names where they
        exist (GEMINI_API_KEY is accepted but unused — inference is local)."""
        kwargs = {}
        ckpt = os.getenv("OMNIASR_CHECKPOINT")
        if ckpt:
            kwargs["checkpoint_path"] = ckpt
        elif ckpt is None:
            # No env override: pick up the shipped release checkpoint when
            # the repo carries one (OMNIASR_CHECKPOINT="" opts out). The
            # release is self-describing: a config.json beside the weights
            # sets the model dims (so a released model need not match the
            # code-default config).
            from .models.zoo import default_release_dir

            rel = default_release_dir()
            if rel is not None and (rel / "asr.npz").is_file():
                cfg_file = rel / "config.json"
                if cfg_file.is_file():
                    return PipelineConfig.from_json(
                        cfg_file.read_text(),
                        checkpoint_path=str(rel / "asr.npz"))
                kwargs["checkpoint_path"] = str(rel / "asr.npz")
        return PipelineConfig(**kwargs)

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)


def config_for_checkpoint(ckpt: str) -> "PipelineConfig":
    """Config for an EXPLICIT checkpoint path, bypassing release discovery.

    Eval tools take ``--ckpt``; building their config via :meth:`from_env`
    would adopt whatever release checkpoint happens to be installed —
    including its model dims, which then mismatch the requested
    checkpoint's weights (ADVICE r2 medium). Instead: read the
    ``config.json`` the trainer writes beside the checkpoint (self-
    describing, like a release), falling back to code-default dims.
    """
    from pathlib import Path

    p = Path(ckpt)
    for cand in (p / "config.json", p.parent / "config.json"):
        if cand.is_file():
            return PipelineConfig.from_json(cand.read_text(),
                                            checkpoint_path=str(ckpt))
    return PipelineConfig(checkpoint_path=str(ckpt))


def tiny_config() -> PipelineConfig:
    """Small config for tests / CPU-mesh CI runs."""
    return PipelineConfig(
        encoder=EncoderConfig(d_model=128, n_layers=2, n_heads=2, conv_kernel=8),
        frontend=FrontendConfig(),
    )
