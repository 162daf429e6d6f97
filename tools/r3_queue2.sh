#!/bin/bash
# Round-3 TPU queue v2: waits for the running x-vector training, then the
# d512x12 flagship rung, then the finishing sequence — each stage watched
# for tunnel hangs (the d384 run wedged mid-step with all threads in
# futex wait; a stale metrics log is the observable).
#
#   setsid nohup bash tools/r3_queue2.sh <xvector_pid> > /tmp/r3_queue2.log 2>&1 &
set -u
cd /root/repo
XV_PID="${1:-}"
export JAX_COMPILATION_CACHE_DIR=/tmp/omniasr_jax_cache

log() { echo "[r3_queue2 $(date +%H:%M:%S)] $*"; }

# run_watched <logfile> <stale_s> <cmd...>: run cmd in background, kill it
# if logfile goes stale for stale_s (after it first appears).
run_watched() {
  local logfile=$1 stale=$2; shift 2
  "$@" &
  local pid=$!
  log "watched pid $pid: $*"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    # only engage once the log has CONTENT: the metrics file is created
    # empty before the (up to ~25 min) XLA tunnel compile
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

if [ -n "$XV_PID" ]; then
  log "waiting for xvector pid $XV_PID"
  # watchdog for the already-running stage too
  while kill -0 "$XV_PID" 2>/dev/null; do
    sleep 60
    f=checkpoints/xvector/metrics.jsonl
    if [ -s "$f" ]; then
      age=$(( $(date +%s) - $(stat -c %Y "$f") ))
      if [ "$age" -gt 1200 ]; then
        log "xvector log stale ${age}s — killing $XV_PID"
        kill "$XV_PID" 2>/dev/null; sleep 10; kill -9 "$XV_PID" 2>/dev/null
      fi
    fi
  done
  log "xvector stage done"
fi

log "stage 2: d512x12 rung (watched)"
mkdir -p checkpoints/r3_d512x12
run_watched checkpoints/r3_d512x12/metrics.jsonl 1200 \
  python -u -m omnilingual_asr_tpu.train.synth_train \
    --steps 10000 --batch-size 64 --lr 2e-3 --warmup-steps 500 \
    --aux-ramp-start 3000 --aux-ramp-steps 2000 \
    --speed-perturb 0.1 --channel-aug 0.25 --wire mulaw \
    --eval-every 1000 --ckpt-dir checkpoints/r3_d512x12 \
    --metrics-log checkpoints/r3_d512x12/metrics.jsonl \
    > checkpoints/r3_d512x12/train.log 2>&1
rc=$?
log "stage 2 done (rc=$rc)"
if [ "$rc" = "97" ] && [ -d checkpoints/r3_d512x12/last/asr ]; then
  log "stage 2 hang-killed; one resume attempt from last"
  mkdir -p checkpoints/r3_d512x12b
  run_watched checkpoints/r3_d512x12b/metrics.jsonl 1200 \
    python -u -m omnilingual_asr_tpu.train.synth_train \
      --steps 6000 --batch-size 64 --lr 1e-3 --warmup-steps 300 \
      --resume-from checkpoints/r3_d512x12/last \
      --aux-ramp-start 1 --aux-ramp-steps 1 \
      --speed-perturb 0.1 --channel-aug 0.25 --wire mulaw \
      --eval-every 1000 --ckpt-dir checkpoints/r3_d512x12b \
      --metrics-log checkpoints/r3_d512x12b/metrics.jsonl \
      > checkpoints/r3_d512x12b/train.log 2>&1
  log "resume done (rc=$?)"
fi

BEST=""
for c in checkpoints/r3_d512x12b/best checkpoints/r3_d512x12/best \
         checkpoints/r3_d384x8/best checkpoints/r3_d256x4c/best; do
  [ -d "$c/asr" ] && BEST="$c" && break
done
if [ -n "$BEST" ]; then
  log "stage 3: finishing on $BEST"
  bash tools/r3_finish.sh "$BEST"
else
  log "stage 3: no rung checkpoint found"
fi
log "queue complete"
