#!/bin/bash
# Round-4 queue v2: adds the English-transfer contingency stage (F) that
# the original tools/r4_queue.sh lacked, ordered BEFORE the trunk-dependent
# fine-tunes so the summarizer/translator always train at the shipped
# release's width.
#
#   D. finish the flagship d512x12 supervised run (segments, full-state
#      resume) to R4_FLAG_STEPS
#   F. contingency: if D's best does not pass the promotion gate, run the
#      round-3 English-transfer recipe (TRAINING_NOTES "English-transfer
#      push") on the d512 trunk: params-only resume, fresh cooler schedule,
#      English-heavy corpus, select=transfer
#   G. promotion gate over both candidates: synth WER <= 0.0703 AND
#      gettysburg held-out CER <= 0.6667 (the shipped release's own numbers)
#   S. summarizer fine-tune on the winning trunk
#   R. release export
#   T. text translator at the (possibly new) release width
#   E. trimmed eval battery into evals/r4
#
#   setsid nohup bash tools/r4b_queue.sh >> /tmp/r4_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

DEADLINE_EPOCH=${R4_DEADLINE_EPOCH:-1787188500}
FLAG=checkpoints/r4_d512x12
ENFT=checkpoints/r4_en_ft
FLAG_STEPS=${R4_FLAG_STEPS:-12000}
ENFT_STEPS=${R4_ENFT_STEPS:-6000}
SEG_STEPS=${R4_SEG_STEPS:-3000}

log() { echo "[r4b $(date +%H:%M:%S)] $*"; }

before_deadline() { [ "$(date +%s)" -lt "$DEADLINE_EPOCH" ]; }

secs_to_deadline() {
  local s=$(( DEADLINE_EPOCH - $(date +%s) ))
  [ "$s" -lt 60 ] && s=60
  echo "$s"
}

probe() {
  timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()))
" > /dev/null 2>&1
}

wait_tpu() {
  until probe; do
    before_deadline || return 1
    log "TPU unclaimable; retry in 3 min"
    sleep 180
  done
  return 0
}

run_watched() {  # <logfile> <stale_s> <cmd...>
  # Kills on EITHER (a) a stale non-empty log, or (b) an empty log once
  # the child has run past the max observed clean startup (compile + pool
  # build ≈ 15 min; round-4 wedge signature (b) never writes a line).
  local logfile=$1 stale=$2; shift 2
  if [ -s "$logfile" ]; then
    mv "$logfile" "$logfile.$(date +%s).prev"
  fi
  "$@" &
  local pid=$!
  local started=$(date +%s)
  log "watched pid $pid"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    local now=$(date +%s) age lim
    if [ -s "$logfile" ]; then
      age=$(( now - $(stat -c %Y "$logfile") ))
      lim=$stale
    else
      age=$(( now - started ))
      lim=1560
    fi
    if [ "$age" -gt "$lim" ]; then
      log "log $logfile age ${age}s > ${lim}s — killing $pid"
      kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
      return 97
    fi
  done
  wait "$pid" 2>/dev/null
  return $?
}

state_step() {
  python - "$1" <<'PY'
import sys, pathlib
import numpy as np
p = pathlib.Path(sys.argv[1]) / "train_state.npz"
try:
    with np.load(p) as z:
        print(int(z["__step__"]))
except Exception:
    print(0)
PY
}

metrics_best() {  # <best/eval.json> -> "synth_wer gettysburg_cer"
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

passes_gate() {  # <wer> <cer>
  python -c "
import sys
w, c = float('$1'), float('$2')
sys.exit(0 if (w <= 0.0703 and c <= 0.6667) else 1)
" 2>/dev/null
}

# --- stage D: finish the flagship run ----------------------------------------
mkdir -p "$FLAG"
while before_deadline; do
  DONE=$(state_step "$FLAG/last")
  [ "$DONE" -ge "$FLAG_STEPS" ] && { log "stage D complete ($DONE steps)"; break; }
  wait_tpu || break
  # the claim wait can span a whole segment run by an earlier orphaned
  # trainer — re-read the step before committing to a redundant segment
  DONE=$(state_step "$FLAG/last")
  [ "$DONE" -ge "$FLAG_STEPS" ] && { log "stage D complete ($DONE steps)"; break; }
  SECS=$(secs_to_deadline)
  [ "$SECS" -lt 900 ] && { log "stage D: <15 min left, stopping"; break; }
  if [ -d "$FLAG/last/asr" ]; then
    ARGS="--resume-from $FLAG/last"
  else
    ARGS="--d-model 512 --n-layers 12 --n-heads 8"
  fi
  log "stage D: flagship segment from step $DONE (cap ${SECS}s)"
  run_watched "$FLAG/metrics.jsonl" 1500 \
    timeout "$SECS" python -u -m omnilingual_asr_tpu.train.synth_train \
      --steps "$SEG_STEPS" --total-steps "$FLAG_STEPS" --batch-size 64 \
      --lr 1e-3 --warmup-steps 800 $ARGS \
      --aux-ramp-start 3000 --aux-ramp-steps 2000 \
      --english-fraction 0.35 --voice-match 0.5 --english-sentences 0.65 \
      --real-fraction 0.2 --real-match 0.5 --channel-aug 0.25 \
      --speed-perturb 0.1 --wire mulaw \
      --device-pool 2048 --pool-refresh-every 150 \
      --select transfer --select-synth-cap 0.05 \
      --eval-every 1000 --ckpt-dir "$FLAG" \
      --metrics-log "$FLAG/metrics.jsonl" > "$FLAG/train.log" 2>&1
  rc=$?
  NEW=$(state_step "$FLAG/last")
  log "stage D segment rc=$rc (step $DONE -> $NEW)"
  [ "$rc" != "97" ] && [ "$NEW" -le "$DONE" ] && { log "stage D stuck (no progress, rc=$rc); stopping"; break; }
done

# --- stage F: English-transfer contingency -----------------------------------
# Round-3 recipe (TRAINING_NOTES): params-only resume from the main run,
# fresh cooler schedule, English-heavy mix, matched voice, select=transfer.
NEED_FT=1
if [ -d "$FLAG/best/asr" ]; then
  read -r FW FC <<< "$(metrics_best "$FLAG/best/eval.json")"
  if passes_gate "$FW" "$FC"; then
    NEED_FT=0
    log "stage F: skipped — main run already passes the gate ($FW / $FC)"
  fi
fi
if [ "$NEED_FT" = "1" ]; then
  SRC="$FLAG/last"
  [ -d "$FLAG/best/asr" ] && SRC="$FLAG/best"
  mkdir -p "$ENFT"
  while before_deadline; do
    DONE=$(state_step "$ENFT/last")
    [ "$DONE" -ge "$ENFT_STEPS" ] && { log "stage F complete ($DONE steps)"; break; }
    wait_tpu || break
    DONE=$(state_step "$ENFT/last")
    [ "$DONE" -ge "$ENFT_STEPS" ] && { log "stage F complete ($DONE steps)"; break; }
    SECS=$(secs_to_deadline)
    [ "$SECS" -lt 900 ] && { log "stage F: <15 min left, stopping"; break; }
    if [ -d "$ENFT/last/asr" ]; then
      ARGS="--resume-from $ENFT/last"
    else
      [ -d "$SRC/asr" ] || { log "stage F: no source trunk at $SRC"; break; }
      ARGS="--resume-from $SRC --no-resume-opt"
    fi
    log "stage F: en_ft segment from step $DONE (src $SRC, cap ${SECS}s)"
    run_watched "$ENFT/metrics.jsonl" 1500 \
      timeout "$SECS" python -u -m omnilingual_asr_tpu.train.synth_train \
        --steps "$SEG_STEPS" --total-steps "$ENFT_STEPS" --batch-size 64 \
        --lr 6e-4 --warmup-steps 300 $ARGS \
        --aux-ramp-start 1 --aux-ramp-steps 1 \
        --english-fraction 0.45 --voice-match 0.5 --english-sentences 0.65 \
        --real-fraction 0.2 --real-match 0.5 --channel-aug 0.25 \
        --speed-perturb 0.1 --wire mulaw \
        --device-pool 2048 --pool-refresh-every 150 \
        --select transfer --select-synth-cap 0.0703 \
        --eval-every 500 --ckpt-dir "$ENFT" \
        --metrics-log "$ENFT/metrics.jsonl" > "$ENFT/train.log" 2>&1
    rc=$?
    NEW=$(state_step "$ENFT/last")
    log "stage F segment rc=$rc (step $DONE -> $NEW)"
    [ "$rc" != "97" ] && [ "$NEW" -le "$DONE" ] && { log "stage F stuck (no progress, rc=$rc); stopping"; break; }
  done
fi

# --- stage G: promotion gate over both candidates -----------------------------
TRUNK=""
BEST_CER="inf"
for CAND in "$ENFT/best" "$FLAG/best"; do
  [ -d "$CAND/asr" ] || continue
  read -r W C <<< "$(metrics_best "$CAND/eval.json")"
  log "stage G: candidate $CAND synth WER $W, gettysburg CER $C"
  if passes_gate "$W" "$C"; then
    if python -c "exit(0 if float('$C') < float('$BEST_CER') else 1)" 2>/dev/null; then
      TRUNK="$CAND"; BEST_CER="$C"
    fi
  fi
done
if [ -n "$TRUNK" ]; then
  log "stage G: PROMOTED $TRUNK (gettysburg CER $BEST_CER)"
else
  log "stage G: no candidate passes (release stands)"
fi

# --- stage S: summarizer fine-tune on the promoted trunk ----------------------
if [ -n "$TRUNK" ] && before_deadline; then
  wait_tpu && {
    SECS=$(secs_to_deadline); [ "$SECS" -gt 2700 ] && SECS=2700
    log "stage S: summarizer fine-tune on $TRUNK (cap ${SECS}s)"
    timeout "$SECS" python -u -m omnilingual_asr_tpu.train.summary_train \
        --ckpt "$TRUNK/asr" --out "$TRUNK/summarizer_ft" \
        --steps 3000 > "$TRUNK/summary_train.log" 2>&1
    log "stage S rc=$?"
  }
fi

# --- stage R: release export ---------------------------------------------------
if [ -n "$TRUNK" ]; then
  log "stage R: export release from $TRUNK"
  if [ -d "$TRUNK/summarizer_ft" ]; then
    rm -rf "$TRUNK/summarizer"; mv "$TRUNK/summarizer_ft" "$TRUNK/summarizer"
  fi
  cp checkpoints/release/xvector.npz /tmp/r4_keep_xvector.npz 2>/dev/null
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/make_release.py --ckpt "$TRUNK" \
      --out checkpoints/release > /tmp/make_release_r4.log 2>&1
  rc=$?
  [ -f /tmp/r4_keep_xvector.npz ] && cp /tmp/r4_keep_xvector.npz checkpoints/release/xvector.npz
  log "stage R rc=$rc: $(ls checkpoints/release)"
fi

# --- stage T: text translator at the shipped release width --------------------
if before_deadline; then
  wait_tpu && {
    TOUT=checkpoints/r4_translator
    mkdir -p "$TOUT"
    SECS=$(secs_to_deadline); [ "$SECS" -gt 3600 ] && SECS=3600
    log "stage T: text-mode translator (cap ${SECS}s)"
    timeout "$SECS" python -u -m omnilingual_asr_tpu.train.text_translator_train \
        --steps 24000 --batch-size 128 --lr 1e-3 \
        --out "$TOUT" --metrics-log "$TOUT/metrics.jsonl" \
        > "$TOUT/train.log" 2>&1
    log "stage T rc=$?"
    ACC=$(python - <<'PY'
import json, pathlib
acc = 0.0
p = pathlib.Path("checkpoints/r4_translator/metrics.jsonl")
if p.exists():
    for line in p.read_text().splitlines():
        try:
            d = json.loads(line)
            e = d.get("eval", {})
            acc = e.get("translation_word_acc_noisy",
                        e.get("translation_word_acc", acc))
        except Exception:
            pass
print(acc)
PY
)
    log "stage T held-out word acc (noisy): $ACC (ship gate >= 0.8)"
    if python -c "exit(0 if float('$ACC') >= 0.8 else 1)" 2>/dev/null; then
      env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python - <<'PY' \
        && log "stage T: translator SHIPPED"
import sys
sys.path.insert(0, "/root/repo")
from omnilingual_asr_tpu.config import PipelineConfig
from omnilingual_asr_tpu.models.translation import load_translator
from omnilingual_asr_tpu.models.zoo import save_release
cfg = PipelineConfig.from_env()
params = load_translator("checkpoints/r4_translator", cfg, n_layers=4)
save_release("checkpoints/release/translator.npz", params)
PY
    fi
  }
fi

# --- stage E: trimmed eval battery ---------------------------------------------
if before_deadline && [ "$(secs_to_deadline)" -gt 600 ]; then
  wait_tpu && {
    EV_TRUNK=$TRUNK
    if [ -z "$EV_TRUNK" ]; then
      EV_TRUNK=checkpoints/r4_release_seed
      env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python tools/seed_from_release.py --out "$EV_TRUNK" \
        > /tmp/seed_r4.log 2>&1
    fi
    SECS=$(secs_to_deadline)
    log "stage E: eval battery on $EV_TRUNK (cap ${SECS}s)"
    mkdir -p evals/r4
    timeout "$SECS" bash tools/r4_evals.sh "$EV_TRUNK" evals/r4 \
      > /tmp/run_evals_r4.log 2>&1
    log "evals: $(ls evals/r4)"

    python - <<'PY'
import json, pathlib
out = pathlib.Path("evals/r4")
try:
    base = json.loads((out / "diar.json").read_text())
    eig = json.loads((out / "diar_eigengap.json").read_text())
except Exception as e:
    print("compare failed:", e)
    raise SystemExit(0)
b_der, e_der = base.get("value", 1.0), eig.get("value", 1.0)
b_acc = base.get("speaker_count_acc", 0.0)
e_acc = eig.get("speaker_count_acc", 0.0)
print(f"threshold: DER {b_der} count-acc {b_acc}; "
      f"eigengap: DER {e_der} count-acc {e_acc}")
if e_der <= b_der and e_acc > b_acc:
    cfgp = pathlib.Path("checkpoints/release/config.json")
    cfg = json.loads(cfgp.read_text())
    cfg.setdefault("decode", {})["count_mode"] = "eigengap"
    cfgp.write_text(json.dumps(cfg, indent=1))
    print("release config flipped to count_mode=eigengap")
else:
    print("threshold stopping stands")
PY
  }
fi

log "queue done"
