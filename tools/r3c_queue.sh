#!/bin/bash
# Round-3c unified queue. Replaces r3_recover.sh + r3b_queue.sh (both were
# sleeping behind the stale pool-side TPU claim) with a better ordering:
# the English-transfer fine-tune runs FIRST, so the translator/summarizer
# fine-tunes and the release land on the winning trunk instead of being
# wasted on a trunk the English stage then replaces.
#
#   0. probe the TPU every 5 min until the stale claim clears
#   E. English-transfer fine-tune of the d256x4c release trunk on the v2
#      phoneme-English corpus (stress/reduction, matched voice, sentence
#      bank) — selection: min gettysburg held-out CER with synth WER <=
#      0.08 (--select transfer)
#   G. promotion gate: en_ft/best replaces d256x4c/best as the chain's
#      trunk only if gettysburg CER < 0.70 AND synth WER <= 0.08
#   1. translator decoder-only fine-tune on the chosen trunk (ship gate:
#      held-out word acc >= 0.5)
#   2. summarizer fine-tune on the chosen trunk
#   3. release export (stale decoder artifacts dropped first)
#   4. full eval battery into evals/r3
#   5. lexicon-LM fusion sweep
#   D. d512 flagship continuation on the device pool — only while wall
#      clock is before $R3C_TPU_DEADLINE (leave the chip free for the
#      driver's end-of-round bench)
#
#   setsid nohup bash tools/r3c_queue.sh > /tmp/r3c_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

BASE=checkpoints/r3_d256x4c/best
ENFT=checkpoints/r3_en_ft
DEADLINE=${R3C_TPU_DEADLINE:-12:30}   # HH:MM local; no TPU stage STARTS after

log() { echo "[r3c $(date +%H:%M:%S)] $*"; }

before_deadline() {
  python - "$DEADLINE" <<'PY'
import sys, time
hh, mm = map(int, sys.argv[1].split(":"))
t = time.localtime()
sys.exit(0 if (t.tm_hour, t.tm_min) < (hh, mm) else 1)
PY
}

probe() {
  # 240 s budget: a cold terminal needs the claim leg + first remote
  # compile; 90 s can false-negative forever on a free-but-cold pool.
  timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()))
" > /dev/null 2>&1
}

# run_watched <logfile> <stale_s> <cmd...>: kill on stale NON-EMPTY log
# (first remote compile can take ~25 min with an empty log). The watched
# log is rotated first: a non-empty log left by a PREVIOUS run has an old
# mtime and would trip the staleness kill ~60 s after launch, and stale
# evals in an append-mode metrics log would poison the promotion gates.
run_watched() {
  local logfile=$1 stale=$2; shift 2
  if [ -s "$logfile" ]; then
    mv "$logfile" "$logfile.$(date +%s).prev"
  fi
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

metrics_best() {  # <best/eval.json> -> "synth_wer gettysburg_cer" of best/
  # Reads the selected-best eval the trainer writes NEXT TO the weights
  # (synth_train save("best")), so the numbers always describe the saved
  # checkpoint — no re-derivation of the selection rule from logs.
  python - "$1" <<'PY'
import json, sys, pathlib
p = pathlib.Path(sys.argv[1])
w = c = float("inf")
if p.exists():
    try:
        e = json.loads(p.read_text()).get("eval", {})
        w = e.get("synth", {}).get("wer", w)
        c = e.get("gettysburg_heldout", {}).get("cer", c)
    except Exception:
        pass
print(w, c)
PY
}

# --- stage 0: wait for the stale pool-side claim to clear ---------------
log "probing for TPU claim..."
until probe; do
  log "TPU still unclaimable; retry in 5 min"
  sleep 180
done
log "TPU responsive"

# --- stage E: English-transfer fine-tune --------------------------------
TRUNK=$BASE
if [ -d "$BASE/asr" ] && before_deadline; then
  mkdir -p "$ENFT"
  log "stage E: English-transfer fine-tune from $BASE"
  run_watched "$ENFT/metrics.jsonl" 1500 \
    python -u -m omnilingual_asr_tpu.train.synth_train \
      --steps 10000 --batch-size 64 --lr 6e-4 --warmup-steps 200 \
      --resume-from "$BASE" --aux-ramp-start 1 --aux-ramp-steps 1000 \
      --english-fraction 0.45 --voice-match 0.5 --english-sentences 0.65 \
      --real-fraction 0.2 --real-match 0.5 --channel-aug 0.25 \
      --speed-perturb 0.1 --wire mulaw \
      --device-pool 3072 --pool-refresh-every 150 \
      --select transfer --select-synth-cap 0.08 \
      --eval-every 500 --ckpt-dir "$ENFT" \
      --metrics-log "$ENFT/metrics.jsonl" > "$ENFT/train.log" 2>&1
  log "stage E rc=$?"
  read -r ENW ENC <<< "$(metrics_best "$ENFT/best/eval.json")"
  log "stage E best (transfer-selected): synth WER $ENW, gettysburg CER $ENC"
  if [ -d "$ENFT/best/asr" ] && \
     python -c "exit(0 if float('$ENC') < 0.70 and float('$ENW') <= 0.08 else 1)" 2>/dev/null; then
    TRUNK=$ENFT/best
    log "stage G: en_ft PROMOTED (trunk = $TRUNK)"
  else
    log "stage G: en_ft NOT promoted (gate: CER<0.70 and WER<=0.08); trunk stays $BASE"
  fi
else
  log "stage E skipped ($BASE missing or past deadline)"
fi

# --- stage 1: translator fine-tune on the chosen trunk ------------------
if before_deadline; then
  log "stage 1: translator fine-tune (positional decoder) on $TRUNK"
  timeout 5400 python -u -m omnilingual_asr_tpu.train.translator_train \
      --ckpt "$TRUNK/asr" --init-from "$TRUNK/translator" \
      --out "$TRUNK/translator_ft" --steps 6000 \
      --metrics-log "$TRUNK/translator_ft_metrics.jsonl" \
      > "$TRUNK/translator_ft.log" 2>&1
  log "translator rc=$?"
  ACC=$(python - <<PY
import json, pathlib
acc = 0.0
p = pathlib.Path("$TRUNK/translator_ft_metrics.jsonl")
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
    rm -rf "$TRUNK/translator_joint"
    mv "$TRUNK/translator" "$TRUNK/translator_joint"
    mv "$TRUNK/translator_ft" "$TRUNK/translator"
    log "translator_ft promoted (acc $ACC)"
  else
    log "translator NOT shipped (acc $ACC < 0.5); release will omit it"
    rm -rf "$TRUNK/translator_degenerate"
    mv "$TRUNK/translator" "$TRUNK/translator_degenerate" 2>/dev/null
  fi
else
  log "stage 1 skipped (past deadline)"
fi

# --- stage 2: summarizer fine-tune ---------------------------------------
if before_deadline; then
  log "stage 2: summarizer fine-tune on $TRUNK"
  timeout 5400 python -u -m omnilingual_asr_tpu.train.summary_train \
      --ckpt "$TRUNK/asr" --out "$TRUNK/summarizer" \
      --steps 3000 > "$TRUNK/summary_train.log" 2>&1
  log "summarizer rc=$? ($(ls "$TRUNK/summarizer" 2>/dev/null | head -1))"
else
  log "stage 2 skipped (past deadline)"
fi

# --- stage 3: release export ---------------------------------------------
log "stage 3: export release from $TRUNK"
rm -f checkpoints/release/translator.npz checkpoints/release/summarizer.npz
JAX_PLATFORMS=cpu python tools/make_release.py --ckpt "$TRUNK" \
    --out checkpoints/release > /tmp/make_release3c.log 2>&1
log "release: $(ls checkpoints/release)"

# --- stage 4: eval battery ------------------------------------------------
if before_deadline; then
  log "stage 4: eval battery on $TRUNK"
  mkdir -p evals/r3
  bash tools/run_evals.sh "$TRUNK" evals/r3 > /tmp/run_evals3c.log 2>&1
  log "evals: $(ls evals/r3)"
else
  log "stage 4 skipped (past deadline)"
fi

# --- stage 5: lexicon-LM sweep ---------------------------------------------
if before_deadline; then
  log "stage 5: lexicon-LM sweep"
  bash tools/r3_lm_sweep.sh "$TRUNK/asr" evals/r3
else
  log "stage 5 skipped (past deadline)"
fi

# --- stage V: x-vector v2 embedder (DER-gated release inclusion) ----------
# The v1 embedder (0.53 s receptive field) under-separates (in-engine
# same/diff 0.57/0.84 vs crop's 0.03/0.54); the v2 design (1.25 s RF,
# models/xvector.py) was committed at 18:21 but never trained — the
# checkpoints/xvector run predates it (17:47). Ship ONLY if it beats the
# committed crop DER 0.1715 (inline pooling is then free at serve time).
if before_deadline; then
  XV=checkpoints/xvector_v2
  mkdir -p "$XV"
  log "stage V: x-vector v2 training"
  run_watched "$XV/metrics.jsonl" 1500 \
    python -u -m omnilingual_asr_tpu.train.xvector_train \
      --steps 4000 --batch-size 64 --eval-every 500 \
      --ckpt-dir "$XV" --metrics-log "$XV/metrics.jsonl" \
      > "$XV/train.log" 2>&1
  log "stage V train rc=$?"
  if [ -f "$XV/xvector.npz" ]; then
    log "stage V: DER with x-vector v2 (inline)"
    OMNIASR_XVECTOR="$XV/xvector.npz" timeout 2400 \
      python eval_diar.py --ckpt "$TRUNK/asr" --n 16 \
      > /tmp/diar_xv2.log 2>&1
    tail -1 /tmp/diar_xv2.log > evals/r3/diar_xvector_v2.json
    DERXV=$(python - <<'PY'
import json
try:
    print(json.load(open("evals/r3/diar_xvector_v2.json")).get("value", 1.0))
except Exception:
    print(1.0)
PY
)
    log "x-vector v2 DER: $DERXV (crop baseline 0.1715)"
    if python -c "exit(0 if float('$DERXV') < 0.1715 else 1)" 2>/dev/null; then
      cp "$XV/xvector.npz" checkpoints/release/xvector.npz
      log "x-vector v2 SHIPPED (DER $DERXV beats crop)"
    else
      log "x-vector v2 NOT shipped (DER $DERXV >= crop 0.1715)"
    fi
  fi
else
  log "stage V skipped (past deadline)"
fi

# --- stage D: d512 flagship continuation -----------------------------------
# Resume from the BEST d512 state (s1's best, synth WER 0.1086), not the
# night chain's s3/last (0.2013) — each segmented resume bounced and ended
# worse; with the device pool one long run replaces the segment chain.
PREV=checkpoints/r3_d512x12/best
if [ -d "$PREV/asr" ] && before_deadline; then
  DIR=checkpoints/r3_d512x12_p1
  mkdir -p "$DIR"
  # hard cap: never hold the chip past the deadline (end-of-round bench)
  SECS=$(python - "$DEADLINE" <<'PY'
import sys, time
hh, mm = map(int, sys.argv[1].split(":"))
t = time.localtime()
now = t.tm_hour * 3600 + t.tm_min * 60 + t.tm_sec
end = hh * 3600 + mm * 60
print(max(60, end - now))
PY
)
  log "stage D: d512 continuation from $PREV (device pool, cap ${SECS}s)"
  run_watched "$DIR/metrics.jsonl" 1500 \
    timeout "$SECS" python -u -m omnilingual_asr_tpu.train.synth_train \
      --steps 14000 --batch-size 64 --lr 5e-4 --warmup-steps 200 \
      --resume-from "$PREV" --aux-ramp-start 1 --aux-ramp-steps 1000 \
      --english-fraction 0.25 --voice-match 0.5 --english-sentences 0.65 \
      --speed-perturb 0.1 --channel-aug 0.25 --real-match 0.5 \
      --wire mulaw --device-pool 3072 --pool-refresh-every 150 \
      --eval-every 500 --ckpt-dir "$DIR" \
      --metrics-log "$DIR/metrics.jsonl" > "$DIR/train.log" 2>&1
  log "stage D rc=$?"
  # D2: the d512 becomes the release ONLY if it beats the trunk on BOTH
  # held-out synth WER and real-recording CER — a bigger rung that is
  # worse on either metric is evidence, not a product.
  read -r DW DC <<< "$(metrics_best "$DIR/best/eval.json")"
  read -r TW TC <<< "$(metrics_best "$TRUNK/eval.json")"
  # pre-eval.json trunk (d256x4c baseline): committed numbers stand in
  if [ "$TW" = "inf" ]; then TW=0.0256; TC=0.7727; fi
  log "stage D2 gate: d512 (WER $DW, CER $DC) vs trunk (WER $TW, CER $TC)"
  if [ -d "$DIR/best/asr" ] && python -c "
import sys
dw, dc, tw, tc = map(float, '''$DW $DC $TW $TC'''.split())
sys.exit(0 if (dw <= tw and dc <= tc and dw <= 0.08) else 1)
" 2>/dev/null; then
    log "stage D2: d512 beats the trunk on both metrics — exporting release"
    rm -f checkpoints/release/translator.npz checkpoints/release/summarizer.npz
    JAX_PLATFORMS=cpu python tools/make_release.py --ckpt "$DIR/best" \
        --out checkpoints/release > /tmp/make_release_d512.log 2>&1
    log "release: $(ls checkpoints/release)"
  else
    log "stage D2: d512 NOT exported (trunk release stands; d512 stays committed evidence)"
  fi
else
  log "stage D skipped (no $PREV or past deadline)"
fi
log "queue done"
