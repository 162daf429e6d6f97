#!/bin/bash
# Round-3 finishing sequence for a chosen rung checkpoint:
#   1. fine-tune the neural summarizer against the rung's trunk
#   2. export checkpoints/release (asr + translator + summarizer +
#      xvector) with the rung's config.json
#   3. run the full eval battery into evals/r3/
#
#   bash tools/r3_finish.sh checkpoints/r3_d512x12/best [summary_steps]
set -u
cd /root/repo
CKPT=${1:?usage: r3_finish.sh <rung ckpt dir (containing asr/)> [summary_steps]}
SUM_STEPS=${2:-3000}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

log() { echo "[r3_finish $(date +%H:%M:%S)] $*"; }

if [ ! -d "$CKPT/asr" ]; then
  log "no $CKPT/asr — aborting"
  exit 1
fi

log "stage 1: summarizer fine-tune on $CKPT"
timeout 5400 python -u -m omnilingual_asr_tpu.train.summary_train \
    --ckpt "$CKPT/asr" --out "$CKPT/summarizer" \
    --steps "$SUM_STEPS" > "$CKPT/summary_train.log" 2>&1
log "summarizer rc=$? ($(ls "$CKPT/summarizer" 2>/dev/null | head -1))"

log "stage 1b: translator decoder-only fine-tune (joint training left word
acc at 0.124 — the bijective cipher should be fully learnable)"
if [ -d "$CKPT/translator" ]; then
  timeout 4500 python -u -m omnilingual_asr_tpu.train.translator_train \
      --ckpt "$CKPT/asr" --init-from "$CKPT/translator" \
      --out "$CKPT/translator_ft" --steps 6000 \
      > "$CKPT/translator_ft.log" 2>&1
  log "translator_ft rc=$?"
  if [ -d "$CKPT/translator_ft" ] && \
     [ -n "$(ls -A "$CKPT/translator_ft" 2>/dev/null)" ]; then
    rm -rf "$CKPT/translator_joint"
    mv "$CKPT/translator" "$CKPT/translator_joint"
    mv "$CKPT/translator_ft" "$CKPT/translator"
  fi
fi

log "stage 2: export release"
JAX_PLATFORMS=cpu python tools/make_release.py --ckpt "$CKPT" \
    --out checkpoints/release > /tmp/make_release.log 2>&1
log "release: $(ls checkpoints/release)"

log "stage 3: eval battery"
mkdir -p evals/r3
bash tools/run_evals.sh "$CKPT" evals/r3 > /tmp/run_evals.log 2>&1
log "evals: $(ls evals/r3)"
log "done"
