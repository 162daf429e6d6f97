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

BEST=""
for c in checkpoints/r3_d512x12/best checkpoints/r3_d384x8/best \
         checkpoints/r3_d256x4c/best; do
  [ -d "$c/asr" ] && BEST="$c" && break
done
if [ -n "$BEST" ]; then
  log "finishing on $BEST"
  bash tools/r3_finish.sh "$BEST"
else
  log "no rung checkpoint found"
fi
log "queue complete"
