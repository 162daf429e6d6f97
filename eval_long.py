"""Measured long-file run (VERDICT r1 #10): N hours of synthetic audio
end-to-end through the engine, reporting wall time, RTF and the projected
time on an 8-chip mesh (windows batch over the 'data' axis, so the forward
scales ~linearly; decode/assembly stay host-side).

    python eval_long.py --hours 9.5                  # real chip
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python eval_long.py --hours 0.5 --tiny       # CI mechanics

North star (BASELINE.md): 9.5 h transcribed + diarized < 2 min on 8 chips.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_long_audio(seconds: float, sr: int = 16000,
                    path: str = "/tmp/omniasr_long.wav") -> str:
    """Speech-like multi-speaker audio written as 16-bit WAV, chunked so the
    writer stays under a few hundred MB of RAM."""
    import wave

    rng = np.random.default_rng(0)
    n = int(seconds * sr)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        chunk = 60 * sr
        t0 = 0
        while t0 < n:
            m = min(chunk, n - t0)
            t = (t0 + np.arange(m)) / sr
            f0 = 110 + 60 * np.sin(2 * np.pi * 0.013 * t)  # slow speaker drift
            x = 0.3 * np.sin(2 * np.pi * f0 * t) \
                + 0.12 * np.sin(2 * np.pi * 2.1 * f0 * t)
            gate = (np.sin(2 * np.pi * 0.21 * t) > -0.6)
            x = x * gate + 0.03 * rng.standard_normal(m)
            w.writeframes((np.clip(x, -1, 1) * 20000).astype("<i2").tobytes())
            t0 += m
    return path


def virtual_mesh_overhead(n: int,
                          path: str = "evals/r4/scaling.json") -> Optional[float]:
    """cpu_s(1)/cpu_s(n) from the virtual-mesh sweep — reported for
    transparency, NOT used in the projection: measured on this host the
    factor is 0.22 at n=2 and 0.03 at n=8 with SUPER-linear growth, the
    signature of XLA CPU collective busy-wait under single-core
    oversubscription (each virtual device's thread spins at the rendezvous
    while the others compute), not of the sharded program's real work.
    The DP long path it would correct shards WINDOWS over the data axis
    with no inter-chip collective in the forward at all (the only
    cross-device op is the output gather), so the defensible projection is
    linear scaling times the exact batch-quantization load imbalance —
    both computed in main(). Returns None when the artifact is absent."""
    import os

    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               path)) as f:
            pts = {p["n_devices"]: (p.get("cpu_s") or p.get("forward_s"))
                   for p in json.load(f).get("points", [])}
        if pts.get(1) and pts.get(n):
            return round(pts[1] / pts[n], 4)
    except Exception:
        pass
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=9.5)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CPU-mesh mechanics run)")
    ap.add_argument("--batch-windows", type=int, default=8)
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the environment's site hook pre-imports jax on the TPU backend;
        # env vars alone are too late (same dance as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    from omnilingual_asr_tpu.config import PipelineConfig, tiny_config
    from omnilingual_asr_tpu.engine import TranscriptionEngine

    seconds = args.hours * 3600
    path = make_long_audio(seconds)

    cfg = tiny_config() if args.tiny else PipelineConfig.from_env()
    engine = TranscriptionEngine(config=cfg,
                                 batch_windows_per_device=args.batch_windows)
    n_chips = engine.mesh.devices.size

    # warmup compile on a short slice so the measured run is steady-state
    warm = make_long_audio(engine.window_samples / 16000 * engine.batch_size,
                           path="/tmp/omniasr_warm.wav")
    engine.transcribe(warm)

    t0 = time.perf_counter()
    c0 = time.process_time()
    result = engine.transcribe(path)
    wall = time.perf_counter() - t0
    cpu = time.process_time() - c0

    trace = engine.last_trace
    stage_s = {}
    if trace is not None:
        stage_s = {name: round(s, 2) for name, s in trace.stages.items()}
    rtf = seconds / wall
    # windows shard over 'data': scale the forward (device-blocked) stage
    # to 8 chips. "extract" is per-window host work that the pipelined
    # engine already overlaps with device compute, so the pipeline phase
    # projects as max(scaled forward, extract); decode (absent on the
    # streaming path, where it rides inside the forward) and the global
    # assemble stay host-serial.
    fwd = stage_s.get("forward", wall)
    ext = stage_s.get("extract", 0.0)
    dec = stage_s.get("decode", 0.0)
    asm = stage_s.get("assemble", 0.0)
    # 8-chip projection (VERDICT r3 #7): windows shard over the mesh
    # 'data' axis and the forward contains NO inter-chip collective (each
    # window is independent; the only cross-device op is the output
    # gather), so the forward projects linearly EXCEPT for batch
    # quantization — the last global batch runs partially full. That
    # imbalance is computable exactly from the window count. The
    # virtual-mesh sweep factor is reported alongside but rejected for
    # the projection (see virtual_mesh_overhead docstring: single-core
    # collective busy-wait, super-linear in n, not a property of the
    # sharded program).
    n_windows = max(1, int(np.ceil(seconds * 16000 / engine.window_samples)))
    b8 = args.batch_windows * 8
    imbalance = (np.ceil(n_windows / b8) * b8) / n_windows
    projected_8 = dec + max(fwd * n_chips / 8.0 * imbalance, ext) + asm
    host_floor = dec + ext + asm
    vm8 = virtual_mesh_overhead(8)
    print(json.dumps({
        "metric": "long_file_wall_s",
        "audio_hours": args.hours,
        "backend": jax.default_backend(),
        "n_chips": n_chips,
        "wall_s": round(wall, 2),
        # Total process CPU seconds: on a timeshared host this is the
        # contention-robust cost of the (possibly GSPMD-partitioned)
        # program — wall time is not (tools/scaling_sweep.py).
        "cpu_s": round(cpu, 2),
        "rtf": round(rtf, 1),
        "stages_s": stage_s,
        "projected_8chip_s": round(projected_8, 2),
        "projection_model": "linear DP forward x batch-quantization "
                            "imbalance (no inter-chip collectives on this "
                            "path); virtual-mesh factor rejected as "
                            "busy-wait artifact",
        "batch_imbalance_8": round(float(imbalance), 4),
        "virtual_mesh_cpu_overhead_8": vm8,
        "host_floor_s": round(host_floor, 2),
        "target_s": 120.0,
        "n_segments": len(result.segments),
        "n_speakers": len({s.speaker for s in result.segments}),
    }))


if __name__ == "__main__":
    main()
