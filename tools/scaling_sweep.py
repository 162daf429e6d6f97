"""Measured multi-chip scaling curve (VERDICT r3 #7).

Round-3's `projected_8chip_s` assumed perfect data-axis scaling of the
forward with zero interconnect cost. This sweep MEASURES forward time vs
device count on the virtual CPU mesh (the same GSPMD program that runs on
real chips — collective overhead and sharding boundaries are real even when
the 'chips' are host cores), fits speedup(n), and emits the curve the
long-file projection should be corrected by.

    python tools/scaling_sweep.py --hours 0.2 --out evals/r4/scaling.json

Caveats recorded in the artifact: a 1-core host timeshares the virtual
devices, so ABSOLUTE times are meaningless — the informative signal is the
relative cost of the sharded program (compile partitioning, collective
insertions, uneven last batches) as n grows.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run_point(n: int, hours: float) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={n} "
                        + env.get("XLA_FLAGS", "")).strip()
    out = subprocess.run(
        [sys.executable, "eval_long.py", "--hours", str(hours), "--tiny",
         "--batch-windows", "2"],
        env=env, capture_output=True, text=True, timeout=3600,
        cwd=str(Path(__file__).resolve().parents[1]))
    lines = out.stdout.strip().splitlines()
    if not lines:
        raise RuntimeError(
            f"eval_long produced no output at n={n} "
            f"(rc={out.returncode}):\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=0.2)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--reps", type=int, default=2,
                    help="runs per point; keep the fastest (the host "
                         "timeshares with background work, so min is the "
                         "least-contended estimate)")
    ap.add_argument("--out", default="evals/r4/scaling.json")
    args = ap.parse_args()

    points = []
    for n in [int(x) for x in args.devices.split(",")]:
        runs = [run_point(n, args.hours) for _ in range(max(1, args.reps))]
        r = min(runs, key=lambda d: d.get("cpu_s") or float("inf"))
        fwd = r.get("stages_s", {}).get("forward")
        points.append({"n_devices": n,
                       "cpu_s": r.get("cpu_s"),
                       "forward_s": fwd,
                       "wall_s": r.get("wall_s"),
                       "reps": len(runs),
                       "stages_s": r.get("stages_s")})
        print(json.dumps(points[-1]), flush=True)

    # Overhead from PROCESS CPU TIME, not wall: the single-core host
    # timeshares the virtual devices AND whatever else is running, so wall
    # time conflates contention with the sharded program's real extra work;
    # total CPU seconds counts only the latter.
    base = next((p["cpu_s"] for p in points if p["n_devices"] == 1
                 and p["cpu_s"]), None)
    for p in points:
        if base and p["cpu_s"]:
            p["cpu_overhead_factor"] = round(base / p["cpu_s"], 3)

    report = {
        "metric": "forward_scaling_virtual_mesh",
        "hours": args.hours,
        "host": "single-core (virtual devices timeshare; cpu_s is the "
                "contention-robust cost — cpu_overhead_factor(n) = "
                "cpu_s(1)/cpu_s(n), 1.0 = no partitioning overhead)",
        "points": points,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps({"written": str(out),
                      "points": [(p["n_devices"],
                                  p.get("cpu_overhead_factor"))
                                 for p in points]}))


if __name__ == "__main__":
    main()
