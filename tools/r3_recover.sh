#!/bin/bash
# Round-3 recovery driver. The s3 d512 segment wedged mid-step and its
# kill left the pool-side TPU claim stuck: every new client (summarizer,
# translator ft, eval battery) blocked ~25 min in the claim retry loop
# and died with "Unable to initialize backend 'axon'". This driver:
#
#   0. probes the TPU every 5 min (tiny matmul, 90 s budget) until the
#      stale claim clears
#   1. translator decoder-only fine-tune (first run WITH the learned
#      target-position table — the "the the the" fix)
#   2. summarizer fine-tune
#   3. release re-export, shipping the translator ONLY if its held-out
#      word accuracy clears 0.5 (a degenerate translator is worse than
#      the engine's honest None gating)
#   4. full eval battery into evals/r3
#   5. lexicon-LM fusion sweep
#
#   setsid nohup bash tools/r3_recover.sh > /tmp/r3_recover.log 2>&1 &
set -u
cd /root/repo
CKPT=${1:-checkpoints/r3_d256x4c/best}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

log() { echo "[r3_recover $(date +%H:%M:%S)] $*"; }

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()))
" > /dev/null 2>&1
}

log "probing for TPU claim..."
until probe; do
  log "TPU still unclaimable; retry in 5 min"
  sleep 300
done
log "TPU responsive"

log "stage 1: translator fine-tune (positional decoder)"
timeout 5400 python -u -m omnilingual_asr_tpu.train.translator_train \
    --ckpt "$CKPT/asr" --init-from "$CKPT/translator" \
    --out "$CKPT/translator_ft" --steps 6000 \
    --metrics-log "$CKPT/translator_ft_metrics.jsonl" \
    > "$CKPT/translator_ft.log" 2>&1
log "translator rc=$?"

ACC=$(python - <<PY
import json, pathlib
acc = 0.0
p = pathlib.Path("$CKPT/translator_ft_metrics.jsonl")
if p.exists():
    for line in p.read_text().splitlines():
        try:
            d = json.loads(line)
            acc = d.get("eval", {}).get("translation_word_acc", acc)
        except Exception:
            pass
print(acc)
PY
)
log "translator held-out word acc: $ACC"
if python -c "exit(0 if float('$ACC') >= 0.5 else 1)"; then
  rm -rf "$CKPT/translator_joint"
  mv "$CKPT/translator" "$CKPT/translator_joint"
  mv "$CKPT/translator_ft" "$CKPT/translator"
  log "translator_ft promoted (acc $ACC)"
else
  # Degenerate decoder: keep it OUT of the release entirely — the
  # engine's honest gating (None unless trained weights ship) is the
  # better product behavior.
  rm -rf "$CKPT/translator_degenerate"
  mv "$CKPT/translator" "$CKPT/translator_degenerate" 2>/dev/null
  log "translator NOT shipped (acc $ACC < 0.5); release will omit it"
fi

log "stage 2: summarizer fine-tune"
timeout 5400 python -u -m omnilingual_asr_tpu.train.summary_train \
    --ckpt "$CKPT/asr" --out "$CKPT/summarizer" \
    --steps 3000 > "$CKPT/summary_train.log" 2>&1
log "summarizer rc=$? ($(ls "$CKPT/summarizer" 2>/dev/null | head -1))"

log "stage 3: export release"
# make_release only ADDS files — drop stale decoder artifacts first so a
# not-promoted translator can't linger from an earlier export.
rm -f checkpoints/release/translator.npz checkpoints/release/summarizer.npz
JAX_PLATFORMS=cpu python tools/make_release.py --ckpt "$CKPT" \
    --out checkpoints/release > /tmp/make_release3.log 2>&1
log "release: $(ls checkpoints/release)"

log "stage 4: eval battery"
mkdir -p evals/r3
bash tools/run_evals.sh "$CKPT" evals/r3 > /tmp/run_evals.log 2>&1
log "evals: $(ls evals/r3)"

log "stage 5: lexicon-LM sweep"
bash tools/r3_lm_sweep.sh "$CKPT/asr" evals/r3
log "done"
