#!/bin/bash
# Round-3b queue: d512 flagship continuation on the device-resident pool.
#
# Waits for the r3_recover chain (translator/summarizer fine-tunes, release
# export, eval battery, LM sweep) to finish, then resumes the d512x12 rung
# from its last segment with --device-pool: per-step H2D drops to a [B]
# index vector, which removes the tunnel leak and most of the wedge
# exposure that forced 3000-step segments (tools/r3_night.sh header). One
# long segment replaces the segment chain; the stale-log watchdog stays as
# the backstop, and a cooler second segment runs if the first ends early
# or above the quality gate.
#
#   setsid nohup bash tools/r3b_queue.sh > /tmp/r3b_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/omniasr_jax_cache

log() { echo "[r3b $(date +%H:%M:%S)] $*"; }

# run_watched <logfile> <stale_s> <cmd...>: kill on stale NON-EMPTY log.
run_watched() {
  local logfile=$1 stale=$2; shift 2
  "$@" &
  local pid=$!
  log "watched pid $pid"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    if [ -s "$logfile" ]; then
      local age=$(( $(date +%s) - $(stat -c %Y "$logfile") ))
      if [ "$age" -gt "$stale" ]; then
        log "log $logfile stale ${age}s — killing $pid"
        kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
        return 97
      fi
    fi
  done
  wait "$pid" 2>/dev/null
  return $?
}

best_wer() {  # lowest in-run held-out synth eval WER of a metrics log
  python - "$1" <<'PY'
import json, sys, pathlib
best = float("inf")
p = pathlib.Path(sys.argv[1])
if p.exists():
    for line in p.read_text().splitlines():
        try:
            w = json.loads(line).get("eval", {}).get("synth", {}).get("wer")
            if w is not None:
                best = min(best, w)
        except Exception:
            pass
print(best)
PY
}

# --- stage 0: wait for the r3_recover chain to release the TPU ---------
# Pass the recover driver's PID as $1 (no pattern matching: kill -0 by the
# exact PID only). Without a PID, start immediately.
RECOVER_PID=${1:-}
if [ -n "$RECOVER_PID" ]; then
  while kill -0 "$RECOVER_PID" 2>/dev/null; do
    log "r3_recover (pid $RECOVER_PID) still running; waiting 5 min"
    sleep 300
  done
fi
log "r3_recover finished"

PREV=checkpoints/r3_d512x12_s3/last
LR=5e-4
STEPS=14000
for SEG in p1 p2; do
  DIR=checkpoints/r3_d512x12_$SEG
  if [ ! -d "$PREV/asr" ]; then
    log "no $PREV to resume — stopping"
    break
  fi
  mkdir -p "$DIR"
  log "segment $SEG: resume from $PREV (device pool, lr $LR, $STEPS steps)"
  run_watched "$DIR/metrics.jsonl" 1500 \
    python -u -m omnilingual_asr_tpu.train.synth_train \
      --steps "$STEPS" --batch-size 64 --lr "$LR" --warmup-steps 200 \
      --resume-from "$PREV" --aux-ramp-start 1 --aux-ramp-steps 1000 \
      --speed-perturb 0.1 --channel-aug 0.25 --real-match 0.5 \
      --wire mulaw --device-pool 3072 --pool-refresh-every 150 \
      --eval-every 500 --ckpt-dir "$DIR" \
      --metrics-log "$DIR/metrics.jsonl" > "$DIR/train.log" 2>&1
  log "segment $SEG rc=$?"
  [ -d "$DIR/last/asr" ] && PREV="$DIR/last"
  W=$(best_wer "$DIR/metrics.jsonl")
  log "segment $SEG best held-out synth WER: $W"
  if python -c "exit(0 if float('$W') <= 0.08 else 1)" 2>/dev/null; then
    log "quality gate reached — stopping the ladder"
    break
  fi
  LR=3e-4
  STEPS=10000
done

# --- flagship export (separate from checkpoints/release: the shipped
# release keeps the d256 encoder its translator/summarizer heads were
# fine-tuned against; the flagship ships beside it with its own evals) ---
BEST_DIR=""
BEST_W=999
for SEG in p1 p2; do
  D=checkpoints/r3_d512x12_$SEG
  [ -d "$D/best/asr" ] || continue
  W=$(best_wer "$D/metrics.jsonl")
  if python -c "exit(0 if float('$W') < float('$BEST_W') else 1)" 2>/dev/null; then
    BEST_W=$W; BEST_DIR=$D
  fi
done
if [ -n "$BEST_DIR" ] && python -c "exit(0 if float('$BEST_W') <= 0.15 else 1)"; then
  log "exporting flagship from $BEST_DIR/best (WER $BEST_W)"
  JAX_PLATFORMS=cpu python tools/make_release.py --ckpt "$BEST_DIR/best" \
      --out checkpoints/flagship > /tmp/make_flagship.log 2>&1
  log "flagship: $(ls checkpoints/flagship 2>/dev/null)"
  log "eval: flagship through the engine"
  timeout 3600 python eval_synth.py --ckpt checkpoints/flagship/asr.npz \
      --n 96 --out /tmp/omniasr_eval_flagship \
      > evals/r3/synth_d512_flagship.json 2>/tmp/eval_flagship.err
  log "flagship eval: $(cat evals/r3/synth_d512_flagship.json 2>/dev/null)"
else
  log "no flagship export (best $BEST_W > 0.15)"
fi
log "done"
