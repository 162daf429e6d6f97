"""Pretrain-contribution ablation artifact (VERDICT r3 #2).

Compares the round-4 flagship run (BEST-RQ-initialized d512x12,
checkpoints/r4_d512x12/metrics.jsonl) against the round-3 from-scratch
d512x12 baseline at matched step counts. The r3 baseline numbers are the
in-run held-out synth WER evals recorded in TRAINING_NOTES.md ("Night
driver" section): the from-scratch rung with params-only segment resume
measured WER 0.109 @ 3000 (s1), 0.157 @ 2000 post-resume (s2), 0.201 @
1000 post-resume (s3) — i.e. both the scratch init AND the optimizer
restarts are in the baseline, exactly the two things round 4 changed.

    python tools/ablation_r4.py --out evals/r4/ablation.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

R3_BASELINE = {
    "run": "r3 d512x12 from scratch, params-only segment resume",
    "source": "TRAINING_NOTES.md 'Night driver (segments s2/s3)'",
    "points": [
        {"step": 3000, "synth_wer": 0.109, "note": "s1, uninterrupted"},
        {"step": 5000, "synth_wer": 0.157,
         "note": "s2 @2000 post-resume (optimizer restarted)"},
        {"step": 6000, "synth_wer": 0.201,
         "note": "s3 @1000 post-resume (optimizer restarted)"},
    ],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", default="checkpoints/r4_d512x12/metrics.jsonl")
    ap.add_argument("--pretrain-metrics",
                    default="checkpoints/r4_bestrq/metrics.jsonl")
    ap.add_argument("--out", default="evals/r4/ablation.json")
    args = ap.parse_args()

    points = []
    p = Path(args.metrics)
    if p.exists():
        for line in p.read_text().splitlines():
            try:
                d = json.loads(line)
            except Exception:
                continue
            ev = d.get("eval")
            if not ev:
                continue
            points.append({
                "step": d.get("step"),
                "synth_wer": ev.get("synth", {}).get("wer"),
                "gettysburg_cer": ev.get("gettysburg_heldout",
                                         {}).get("cer"),
            })

    pre = {}
    pp = Path(args.pretrain_metrics)
    if pp.exists():
        for line in pp.read_text().splitlines():
            try:
                d = json.loads(line)
            except Exception:
                continue
            if "masked_acc" in d:
                pre = {"steps": d.get("step"),
                       "final_masked_acc": d.get("masked_acc")}

    report = {
        "metric": "pretrain_ablation_d512x12",
        "r4_run": {
            "init": "BEST-RQ pretrain (synth + all real recordings, "
                    "train/pretrain_cli.py)",
            "resume": "full train-state (optimizer + schedule survive "
                      "segments)",
            "pretrain": pre,
            "eval_points": points,
        },
        "r3_baseline": R3_BASELINE,
        "reading": "r4 vs r3 at matched steps isolates {BEST-RQ init + "
                   "full-state resume} jointly; the r3 s2/s3 points "
                   "additionally show the optimizer-restart bounce the "
                   "full-state resume removes.",
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps({"written": str(out), "n_points": len(points)}))


if __name__ == "__main__":
    main()
