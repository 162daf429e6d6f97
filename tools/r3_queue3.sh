#!/bin/bash
# Round-3 queue v3: watch an ALREADY-RUNNING training pid (hang watchdog
# on its metrics log), then run the finishing sequence on the best rung.
#
#   setsid nohup bash tools/r3_queue3.sh <pid> <metrics.jsonl> \
#       > /tmp/r3_queue3.log 2>&1 &
set -u
cd /root/repo
PID=${1:?pid}
LOGF=${2:?metrics log}
export JAX_COMPILATION_CACHE_DIR=/tmp/omniasr_jax_cache

log() { echo "[r3_queue3 $(date +%H:%M:%S)] $*"; }

log "watching pid $PID via $LOGF"
while kill -0 "$PID" 2>/dev/null; do
  sleep 60
  if [ -s "$LOGF" ]; then
    age=$(( $(date +%s) - $(stat -c %Y "$LOGF") ))
    if [ "$age" -gt 1200 ]; then
      log "log stale ${age}s — killing $PID (tunnel wedge)"
      kill "$PID" 2>/dev/null; sleep 10; kill -9 "$PID" 2>/dev/null
    fi
  fi
done
log "training done"

# pick the rung whose LAST in-run synth eval WER is lowest (existence
# alone is not quality: a plateaued rung still writes a 'best' dir)
BEST=$(python - <<'PY'
import json, pathlib
cands = ["checkpoints/r3_d512x12", "checkpoints/r3_d384x8",
         "checkpoints/r3_d256x4c"]
best, best_wer = "", 10.0
for c in cands:
    p = pathlib.Path(c)
    if not (p / "best" / "asr").is_dir():
        continue
    wer = None
    for line in (p / "train.log").read_text().splitlines():
        if '"eval"' in line:
            try:
                w = json.loads(line)["eval"]["synth"]["wer"]
                wer = w if wer is None else min(wer, w)
            except Exception:
                pass
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
log "queue complete"
