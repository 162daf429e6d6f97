#!/bin/bash
# Round-3 session-3 queue. The machine was re-imaged between sessions, so
# only the committed release survived; tools/seed_from_release.py first
# reconstructs a trainer-format trunk from it, then this queue runs the
# r3c plan end-to-end on a fresh 12 h TPU budget:
#
#   0. probe the TPU claim
#   E. English-transfer fine-tune of the d256x4 release trunk on the v2
#      phoneme-English corpus (stress/reduction, matched voice, sentence
#      bank) — selection: min gettysburg held-out CER, synth WER <= 0.08
#   G. promotion gate (gettysburg CER < 0.70 AND synth WER <= 0.08)
#   1. translator decoder-only fine-tune  (ship gate: word acc >= 0.5)
#   2. summarizer fine-tune
#   3. release export
#   4. full eval battery into evals/r3
#   5. lexicon-LM fusion sweep
#   V. x-vector v2 (ship gate: DER < crop 0.1715)
#   D. fresh d512x12 rung on the device pool (the round-2/3 H2D wedge was
#      transfer-buffer retention; the pool's per-step H2D is a [B] index
#      vector) — segment-resume fallback if watched-stale; D2 export gate:
#      beats the trunk on BOTH held-out synth WER and gettysburg CER
#
#   setsid nohup bash tools/r3d_queue.sh > /tmp/r3d_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

BASE=checkpoints/r3_d256x4c/best
ENFT=checkpoints/r3_en_ft
DEADLINE=${R3D_TPU_DEADLINE:-22:15}   # HH:MM local; no TPU stage STARTS after

log() { echo "[r3d $(date +%H:%M:%S)] $*"; }

before_deadline() {
  python - "$DEADLINE" <<'PY'
import sys, time
hh, mm = map(int, sys.argv[1].split(":"))
t = time.localtime()
sys.exit(0 if (t.tm_hour, t.tm_min) < (hh, mm) else 1)
PY
}

secs_to_deadline() {
  python - "$DEADLINE" <<'PY'
import sys, time
hh, mm = map(int, sys.argv[1].split(":"))
t = time.localtime()
now = t.tm_hour * 3600 + t.tm_min * 60 + t.tm_sec
print(max(60, hh * 3600 + mm * 60 - now))
PY
}

probe() {
  timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()))
" > /dev/null 2>&1
}

# run_watched <logfile> <stale_s> <cmd...>: kill on stale NON-EMPTY log
# (first remote compile can take ~25 min with an empty log). Rotates a
# pre-existing log so old mtimes/evals can't trip the kill or the gates.
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

# --- stage 0: TPU claim ---------------------------------------------------
log "probing for TPU claim..."
until probe; do
  log "TPU unclaimable; retry in 3 min"
  sleep 180
done
log "TPU responsive"

# --- stage E: English-transfer fine-tune ----------------------------------
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
    log "stage G: en_ft NOT promoted; trunk stays $BASE"
  fi
else
  log "stage E skipped ($BASE missing or past deadline)"
fi

# --- stage 1: translator fine-tune on the chosen trunk --------------------
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
    log "translator NOT shipped (acc $ACC < 0.5)"
    rm -rf "$TRUNK/translator_degenerate"
    mv "$TRUNK/translator" "$TRUNK/translator_degenerate" 2>/dev/null
  fi
else
  log "stage 1 skipped (past deadline)"
fi

# --- stage 2: summarizer fine-tune -----------------------------------------
if before_deadline; then
  log "stage 2: summarizer fine-tune on $TRUNK"
  timeout 5400 python -u -m omnilingual_asr_tpu.train.summary_train \
      --ckpt "$TRUNK/asr" --out "$TRUNK/summarizer" \
      --steps 3000 > "$TRUNK/summary_train.log" 2>&1
  log "summarizer rc=$? ($(ls "$TRUNK/summarizer" 2>/dev/null | head -1))"
else
  log "stage 2 skipped (past deadline)"
fi

# --- stage 3: release export ------------------------------------------------
log "stage 3: export release from $TRUNK"
rm -f checkpoints/release/translator.npz checkpoints/release/summarizer.npz
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python tools/make_release.py --ckpt "$TRUNK" \
    --out checkpoints/release > /tmp/make_release3d.log 2>&1
log "release: $(ls checkpoints/release)"

# --- stage 4: eval battery ----------------------------------------------------
if before_deadline; then
  log "stage 4: eval battery on $TRUNK"
  mkdir -p evals/r3
  bash tools/run_evals.sh "$TRUNK" evals/r3 > /tmp/run_evals3d.log 2>&1
  log "evals: $(ls evals/r3)"
else
  log "stage 4 skipped (past deadline)"
fi

# --- stage 5: lexicon-LM sweep -------------------------------------------------
if before_deadline; then
  log "stage 5: lexicon-LM sweep"
  bash tools/r3_lm_sweep.sh "$TRUNK/asr" evals/r3
else
  log "stage 5 skipped (past deadline)"
fi

# --- stage V: x-vector v2 embedder (DER-gated release inclusion) ---------------
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

# --- stage D: fresh d512x12 rung on the device pool ------------------------------
# lr 1e-3 (2e-3 destabilizes d512 — TRAINING_NOTES rung 3); aux ramps in
# after CTC locks; segment-resume fallback if the watchdog kills a wedge.
if before_deadline; then
  PREV=""
  for SEG in s1 s2 s3 s4; do
    before_deadline || { log "stage D: past deadline before $SEG"; break; }
    DIR=checkpoints/r3d_d512x12_$SEG
    mkdir -p "$DIR"
    SECS=$(secs_to_deadline)
    [ "$SECS" -lt 900 ] && { log "stage D: <15 min left, stopping"; break; }
    if [ -z "$PREV" ]; then
      log "stage D/$SEG: d512x12 from scratch (cap ${SECS}s)"
      run_watched "$DIR/metrics.jsonl" 1500 \
        timeout "$SECS" python -u -m omnilingual_asr_tpu.train.synth_train \
          --steps 16000 --batch-size 64 --lr 1e-3 --warmup-steps 500 \
          --d-model 512 --n-layers 12 --n-heads 8 \
          --aux-ramp-start 3000 --aux-ramp-steps 2000 \
          --english-fraction 0.25 --voice-match 0.5 --english-sentences 0.65 \
          --real-fraction 0.2 --real-match 0.5 --channel-aug 0.25 \
          --speed-perturb 0.1 --wire mulaw \
          --device-pool 2048 --pool-refresh-every 150 \
          --eval-every 500 --ckpt-dir "$DIR" \
          --metrics-log "$DIR/metrics.jsonl" > "$DIR/train.log" 2>&1
    else
      log "stage D/$SEG: resume from $PREV (cap ${SECS}s)"
      run_watched "$DIR/metrics.jsonl" 1500 \
        timeout "$SECS" python -u -m omnilingual_asr_tpu.train.synth_train \
          --steps 8000 --batch-size 64 --lr 6e-4 --warmup-steps 200 \
          --resume-from "$PREV" --aux-ramp-start 1 --aux-ramp-steps 500 \
          --english-fraction 0.25 --voice-match 0.5 --english-sentences 0.65 \
          --real-fraction 0.2 --real-match 0.5 --channel-aug 0.25 \
          --speed-perturb 0.1 --wire mulaw \
          --device-pool 2048 --pool-refresh-every 150 \
          --eval-every 500 --ckpt-dir "$DIR" \
          --metrics-log "$DIR/metrics.jsonl" > "$DIR/train.log" 2>&1
    fi
    rc=$?
    log "stage D/$SEG rc=$rc"
    [ -d "$DIR/last/asr" ] && PREV="$DIR/last"
    # rc 0 = ran to completion (or timeout'd cleanly) — stop segmenting
    [ "$rc" != "97" ] && break
  done
  # D2: pick the best d512 segment; export as release ONLY if it beats the
  # trunk on BOTH metrics.
  BESTD=$(python - <<'PY'
import json, pathlib
best, bw = "", float("inf")
for p in sorted(pathlib.Path("checkpoints").glob("r3d_d512x12_*")):
    e = p / "best" / "eval.json"
    if not (p / "best" / "asr").is_dir() or not e.exists():
        continue
    try:
        w = json.loads(e.read_text())["eval"]["synth"]["wer"]
    except Exception:
        continue
    if w < bw:
        best, bw = str(p / "best"), w
print(best)
PY
)
  if [ -n "$BESTD" ]; then
    read -r DW DC <<< "$(metrics_best "$BESTD/eval.json")"
    read -r TW TC <<< "$(metrics_best "$TRUNK/eval.json")"
    if [ "$TW" = "inf" ]; then TW=0.0256; TC=0.7727; fi
    log "stage D2 gate: d512 $BESTD (WER $DW, CER $DC) vs trunk (WER $TW, CER $TC)"
    if python -c "
import sys
dw, dc, tw, tc = map(float, '''$DW $DC $TW $TC'''.split())
sys.exit(0 if (dw <= tw and dc <= tc and dw <= 0.08) else 1)
" 2>/dev/null; then
      log "stage D2: d512 beats the trunk on both metrics — exporting release"
      rm -f checkpoints/release/translator.npz checkpoints/release/summarizer.npz
      env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python tools/make_release.py --ckpt "$BESTD" \
          --out checkpoints/release > /tmp/make_release_d512.log 2>&1
      log "release: $(ls checkpoints/release)"
    else
      log "stage D2: d512 NOT exported (trunk release stands)"
    fi
  else
    log "stage D2: no d512 candidate with eval.json"
  fi
else
  log "stage D skipped (past deadline)"
fi
log "queue done"
