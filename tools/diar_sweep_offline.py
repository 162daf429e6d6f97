"""Offline diarization operating-point sweep on cached embeddings.

The round-5 battery measured the {count-mode} x {resegment} grid at the
shipped threshold only (DER 0.194 / count-acc 0.56, eigengap worse, reseg
measured-neutral) — each TPU point costs a full 16-conversation engine run
(~20 min). This tool runs the engine ONCE per conversation, captures the
segment embeddings the engine hands to ``cluster_speakers`` (monkeypatched
capture), and then re-clusters the cached embeddings across a
threshold x count-mode grid for free, scoring DER + speaker-count accuracy
per configuration against the construction-time ground truth.

Segment boundaries (and therefore the miss/false-alarm part of DER) are
decode-determined and identical across configurations; only the speaker
labels change, which is exactly what the sweep varies.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu nice -n 10 \
        python tools/diar_sweep_offline.py --n 16 --out evals/r5/diar_sweep.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--seed", type=int, default=123,
                    help="matches eval_diar so conversations are identical")
    ap.add_argument("--out", default="evals/r5/diar_sweep.json")
    ap.add_argument("--thresholds", default="0.22,0.26,0.30,0.34,0.38")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from eval_diar import make_conversation
    from omnilingual_asr_tpu.config import PipelineConfig
    from omnilingual_asr_tpu.diarization import cluster as cluster_mod
    from omnilingual_asr_tpu.engine import TranscriptionEngine
    from omnilingual_asr_tpu.utils.metrics import der

    cfg = PipelineConfig.from_env()
    engine = TranscriptionEngine(config=cfg, batch_windows_per_device=4)

    # Capture the embeddings the engine clusters (the real pipeline path:
    # CTC segmentation -> speech-weighted pooling -> x-vector), per file.
    captured = {}
    orig_cluster = cluster_mod.cluster_speakers

    def capture_cluster(embeds, **kw):
        captured["embeds"] = np.asarray(embeds)
        return orig_cluster(embeds, **kw)

    cluster_mod.cluster_speakers = capture_cluster

    rng = np.random.default_rng(args.seed)
    convs = []
    for i in range(args.n):
        n_spk = int(rng.integers(2, 5))
        samples, ref = make_conversation(rng, n_spk)
        path = f"/tmp/omniasr_diarsweep_{i}.wav"
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((samples * 32767).astype("<i2").tobytes())
        captured.clear()
        result = engine.transcribe(path)
        os.unlink(path)
        convs.append({
            "n_spk_ref": n_spk,
            "ref": [(t0, t1, spk) for spk, t0, t1 in ref],
            "segs": [(s.start, s.end) for s in result.segments],
            "embeds": captured.get("embeds"),
        })
        print(f"# conv {i}: {len(result.segments)} segments, "
              f"ref {n_spk} speakers", flush=True)

    cluster_mod.cluster_speakers = orig_cluster

    grid = []
    ths = [float(t) for t in args.thresholds.split(",")]
    for th in ths:
        for count_mode in ("threshold", "eigengap"):
            ders, ok = [], 0
            for c in convs:
                if c["embeds"] is None or not c["segs"]:
                    ders.append(1.0)
                    continue
                labels = orig_cluster(c["embeds"], n_clusters=None,
                                      threshold=th, count_mode=count_mode)
                hyp = [(t0, t1, f"S{int(l)}")
                       for (t0, t1), l in zip(c["segs"], labels)]
                ders.append(der(c["ref"], hyp))
                if len(set(int(l) for l in labels)) == c["n_spk_ref"]:
                    ok += 1
            grid.append({
                "ahc_threshold": th,
                "count_mode": count_mode,
                "der": round(float(np.mean(ders)), 4),
                "speaker_count_acc": round(ok / len(convs), 4),
            })

    grid.sort(key=lambda g: (g["der"], -g["speaker_count_acc"]))
    out = {
        "metric": "diar_sweep_offline",
        "n_conversations": args.n,
        "embeddings": "engine path (captured), clustered offline",
        "shipped": {"ahc_threshold": cfg.decode.ahc_threshold,
                    "count_mode": cfg.decode.count_mode},
        "grid": grid,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps({"best": grid[0], "n_grid": len(grid)}))


if __name__ == "__main__":
    main()
