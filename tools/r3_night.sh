#!/bin/bash
# Round-3 night driver: segmented d512 training + rung selection + finish.
#
# WHY segments: the axon tunnel's PJRT client retains H2D transfer buffers
# and DEADLOCKS (all threads futex-wait, zero step progress) when a
# process's RSS reaches ~56 GB — both the d384 and d512 runs wedged there
# (~4300-4850 steps at batch 64 mulaw). Fresh processes every ~3000 steps
# (params resume from the previous segment's last/) stay far below the
# wedge line; the XLA compile cache makes restarts cheap.
#
#   setsid nohup bash tools/r3_night.sh > /tmp/r3_night.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/omniasr_jax_cache

log() { echo "[r3_night $(date +%H:%M:%S)] $*"; }

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

# --- d512 continuation segments (params-only resume; aux at full weight,
# cooler lr per TRAINING_NOTES rung-3: d512 destabilizes above ~1e-3) ---
PREV=checkpoints/r3_d512x12/last
for SEG in s2 s3; do
  DIR=checkpoints/r3_d512x12_$SEG
  if [ ! -d "$PREV/asr" ]; then
    log "no $PREV to resume — skipping segment $SEG"
    break
  fi
  mkdir -p "$DIR"
  log "segment $SEG: resume from $PREV"
  run_watched "$DIR/metrics.jsonl" 1200 \
    python -u -m omnilingual_asr_tpu.train.synth_train \
      --steps 3000 --batch-size 64 --lr 8e-4 --warmup-steps 200 \
      --resume-from "$PREV" --aux-ramp-start 1 --aux-ramp-steps 1000 \
      --speed-perturb 0.1 --channel-aug 0.25 --real-match 0.5 \
      --wire mulaw --eval-every 1000 --ckpt-dir "$DIR" \
      --metrics-log "$DIR/metrics.jsonl" > "$DIR/train.log" 2>&1
  log "segment $SEG rc=$?"
  [ -d "$DIR/last/asr" ] && PREV="$DIR/last"
done

# --- rung selection: lowest in-run eval synth WER across candidates ---
BEST=$(python - <<'PY'
import json, pathlib
cands = ["checkpoints/r3_d512x12_s3", "checkpoints/r3_d512x12_s2",
         "checkpoints/r3_d512x12", "checkpoints/r3_d384x8",
         "checkpoints/r3_d256x4c"]
best, best_wer = "", 10.0
for c in cands:
    p = pathlib.Path(c)
    if not (p / "best" / "asr").is_dir():
        continue
    wer = None
    try:
        for line in (p / "train.log").read_text().splitlines():
            if '"eval"' in line:
                try:
                    w = json.loads(line)["eval"]["synth"]["wer"]
                    wer = w if wer is None else min(wer, w)
                except Exception:
                    pass
    except OSError:
        continue
    if wer is not None and wer < best_wer:
        best, best_wer = str(p / "best"), wer
print(best)
PY
)
if [ -n "$BEST" ]; then
  log "finishing on $BEST"
  bash tools/r3_finish.sh "$BEST"
else
  log "no rung checkpoint found"
fi
log "night driver complete"
