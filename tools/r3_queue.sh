#!/bin/bash
# Round-3 TPU queue: waits for the current training run to exit, then
# (1) trains the x-vector speaker embedder, (2) launches the d512x12
# flagship rung. Detached from any CLI session so TPU hours are not lost
# to session crashes. Logs to /tmp/r3_queue.log.
#
#   setsid nohup bash tools/r3_queue.sh <wait_pid> > /tmp/r3_queue.log 2>&1 &
set -u
cd /root/repo
WAIT_PID="${1:-}"

log() { echo "[r3_queue $(date +%H:%M:%S)] $*"; }

if [ -n "$WAIT_PID" ]; then
  log "waiting for pid $WAIT_PID to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  log "pid $WAIT_PID exited"
  sleep 10
fi

# Stage 1: x-vector embedder (small; ~30-60 min incl. compile)
log "stage 1: xvector training"
mkdir -p checkpoints/xvector
JAX_COMPILATION_CACHE_DIR=/tmp/omniasr_jax_cache \
python -u -m omnilingual_asr_tpu.train.xvector_train \
    --steps 4000 --batch-size 64 --eval-every 500 \
    --ckpt-dir checkpoints/xvector \
    --metrics-log checkpoints/xvector/metrics.jsonl \
    > checkpoints/xvector/train.log 2>&1
log "stage 1 done (rc=$?)"

# Stage 2: d512x12 flagship rung (10k steps ~ 4-5 h; RAM leak budget:
# ~8.2 MB/step mulaw wire -> ~82 GB, inside the 125 GB host)
log "stage 2: d512x12 rung"
mkdir -p checkpoints/r3_d512x12
JAX_COMPILATION_CACHE_DIR=/tmp/omniasr_jax_cache \
python -u -m omnilingual_asr_tpu.train.synth_train \
    --steps 10000 --batch-size 64 --lr 2e-3 --warmup-steps 500 \
    --aux-ramp-start 3000 --aux-ramp-steps 2000 \
    --speed-perturb 0.1 --channel-aug 0.25 --wire mulaw \
    --eval-every 1000 --ckpt-dir checkpoints/r3_d512x12 \
    --metrics-log checkpoints/r3_d512x12/metrics.jsonl \
    > checkpoints/r3_d512x12/train.log 2>&1
log "stage 2 done (rc=$?)"

# Stage 3 (unattended fallback): summarizer + release + eval battery on
# the best available rung. A live session normally intervenes before
# this with the rung choice; if none does, this keeps the round shipping.
BEST=""
for c in checkpoints/r3_d512x12/best checkpoints/r3_d384x8/best \
         checkpoints/r3_d256x4c/best; do
  [ -d "$c/asr" ] && BEST="$c" && break
done
if [ -n "$BEST" ]; then
  log "stage 3: finishing on $BEST"
  bash tools/r3_finish.sh "$BEST"
else
  log "stage 3: no rung checkpoint found"
fi
