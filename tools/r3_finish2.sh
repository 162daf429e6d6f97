#!/bin/bash
# Round-3 follow-on to tools/r3_night.sh: wait for the night driver to
# exit, then repair what it could not do and extend the eval battery.
#
#   1. re-run the summarizer fine-tune (stage 1 failed: the TPU tunnel was
#      still held by the just-killed d512 trainer -> backend UNAVAILABLE)
#   2. re-export checkpoints/release with the summarizer included
#   3. lexicon-LM fusion sweep (tools/r3_lm_sweep.sh) on both eval sets
#
#   setsid nohup bash tools/r3_finish2.sh <night_pid> > /tmp/r3_finish2.log 2>&1 &
set -u
cd /root/repo
NIGHT_PID=${1:?usage: r3_finish2.sh <night driver pid>}
CKPT=${2:-checkpoints/r3_d256x4c/best}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

log() { echo "[r3_finish2 $(date +%H:%M:%S)] $*"; }

while kill -0 "$NIGHT_PID" 2>/dev/null; do
  sleep 60
done
log "night driver ($NIGHT_PID) done"
sleep 30   # let the tunnel release the TPU claim (stage-1 failure mode)

if [ ! -d "$CKPT/summarizer" ] || [ -z "$(ls -A "$CKPT/summarizer" 2>/dev/null)" ]; then
  log "stage A: summarizer fine-tune retry on $CKPT"
  timeout 5400 python -u -m omnilingual_asr_tpu.train.summary_train \
      --ckpt "$CKPT/asr" --out "$CKPT/summarizer" \
      --steps 3000 > "$CKPT/summary_train.log" 2>&1
  log "summarizer rc=$?"
else
  log "stage A: summarizer already present"
fi

log "stage B: re-export release"
JAX_PLATFORMS=cpu python tools/make_release.py --ckpt "$CKPT" \
    --out checkpoints/release > /tmp/make_release2.log 2>&1
log "release: $(ls checkpoints/release)"

log "stage C: lexicon-LM sweep"
bash tools/r3_lm_sweep.sh "$CKPT/asr" evals/r3
log "done"
