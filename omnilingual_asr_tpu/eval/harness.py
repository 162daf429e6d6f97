"""Parity + perf evaluation harness (SURVEY §7 step 10).

Runs the engine over a manifest of (audio, reference-transcript) pairs and
reports corpus WER/CER, per-file RTF, and (when reference turns are given)
DER. Works with any dataset laid out as a JSONL manifest:

    {"audio": "path.wav", "text": "reference transcript",
     "language": "en",                      # optional hint
     "turns": [[0.0, 2.5, "Speaker 1"], ...]}  # optional, for DER

FLEURS: download the parquet/tsv split with the standard tooling, write a
manifest with one line per utterance, and point this harness at it — the
harness itself has no network dependency by design (TPU pods often run
air-gapped).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

from ..utils.metrics import aggregate_wer, der


@dataclass
class EvalReport:
    wer: float
    cer: float
    rtf: float                       # audio seconds per wall second
    n_files: int
    n_ref_words: int
    der_mean: Optional[float] = None
    per_file: List[dict] = field(default_factory=list)

    def to_json(self) -> str:
        d = {k: v for k, v in self.__dict__.items() if k != "per_file"}
        return json.dumps(d)


def load_manifest(path: str | Path) -> List[dict]:
    items = []
    root = Path(path).parent
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        item = json.loads(line)
        audio = Path(item["audio"])
        if not audio.is_absolute():
            item["audio"] = str(root / audio)
        items.append(item)
    return items


def evaluate(engine, manifest: str | Path,
             limit: Optional[int] = None) -> EvalReport:
    """Run the engine over a manifest; returns corpus metrics."""
    items = load_manifest(manifest)
    if limit:
        items = items[:limit]
    pairs = []
    ders = []
    per_file = []
    audio_s = 0.0
    wall_s = 0.0
    for item in items:
        t0 = time.perf_counter()
        result = engine.transcribe_with_retry(
            item["audio"], language=item.get("language"))
        dt = time.perf_counter() - t0
        hyp = " ".join(s.text for s in result.segments)
        pairs.append((item["text"], hyp))
        dur = max((s.end for s in result.segments), default=0.0)
        audio_s += dur
        wall_s += dt
        row = {"audio": item["audio"], "hyp": hyp, "seconds": dt}
        if item.get("turns"):
            ref_turns = [tuple(t) for t in item["turns"]]
            hyp_turns = [(s.start, s.end, s.speaker) for s in result.segments]
            d = der(ref_turns, hyp_turns)
            ders.append(d)
            row["der"] = d
        per_file.append(row)
    agg = aggregate_wer(pairs)
    return EvalReport(
        wer=agg["wer"], cer=agg["cer"],
        rtf=audio_s / wall_s if wall_s else 0.0,
        n_files=len(items), n_ref_words=agg["n_ref_words"],
        der_mean=sum(ders) / len(ders) if ders else None,
        per_file=per_file,
    )


def main():
    import argparse

    ap = argparse.ArgumentParser(description="WER/CER/DER eval harness")
    ap.add_argument("manifest")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    from ..config import PipelineConfig
    from ..engine import TranscriptionEngine

    cfg = PipelineConfig.from_env()
    if args.checkpoint:
        cfg = cfg.replace(checkpoint_path=args.checkpoint)
    engine = TranscriptionEngine(config=cfg)
    report = evaluate(engine, args.manifest, limit=args.limit)
    print(report.to_json())


if __name__ == "__main__":
    main()
