#!/bin/bash
# Round-4 queue: make the flagship real (VERDICT r3 #1/#2).
#
#   P. BEST-RQ pretrain d512x12 on synth + ALL real recordings (~5.9 min of
#      real audio incl. the uploads-dir finds) — train/pretrain_cli.py
#   D. flagship d512x12 supervised from the pretrained init, SEGMENTED with
#      FULL train-state resume (optimizer moments + lr-schedule position
#      survive segment boundaries — the round-3 "post-resume bounce" fix),
#      English-v2 + multilingual mix from the start, transfer selection
#   G. promotion gate: beats the shipped d256 release on BOTH held-out
#      synth WER (<= 0.0703) and gettysburg held-out CER (<= 0.6667)
#   S. summarizer fine-tune on the winning trunk (trunk-dependent)
#   T. text-mode translator on the round-4 reordering/morphology corpus
#      (trunk-independent; ships on word-acc >= 0.8)
#   E. eval battery into evals/r4
#
#   setsid nohup bash tools/r4_queue.sh > /tmp/r4_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

# Deadline: absolute epoch (survives midnight rollover) takes priority;
# falls back to the same-day HH:MM form used by earlier sessions.
DEADLINE_EPOCH=${R4_DEADLINE_EPOCH:-}
if [ -z "$DEADLINE_EPOCH" ]; then
  DEADLINE=${R4_TPU_DEADLINE:-15:00}   # HH:MM local, same-day only
  DEADLINE_EPOCH=$(python - "$DEADLINE" <<'PY'
import sys, time
hh, mm = map(int, sys.argv[1].split(":"))
t = time.localtime()
print(int(time.mktime((t.tm_year, t.tm_mon, t.tm_mday, hh, mm, 0,
                       t.tm_wday, t.tm_yday, t.tm_isdst))))
PY
)
fi
PRE=checkpoints/r4_bestrq
FLAG=checkpoints/r4_d512x12
PRE_STEPS=${R4_PRE_STEPS:-2500}
FLAG_STEPS=${R4_FLAG_STEPS:-16000}
SEG_STEPS=${R4_SEG_STEPS:-2000}

log() { echo "[r4 $(date +%H:%M:%S)] $*"; }

before_deadline() {
  [ "$(date +%s)" -lt "$DEADLINE_EPOCH" ]
}

secs_to_deadline() {
  local s=$(( DEADLINE_EPOCH - $(date +%s) ))
  [ "$s" -lt 60 ] && s=60
  echo "$s"
}

probe() {
  # Cold claims have been measured at ~6 min; 300 s timed out forever.
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

# run_watched <logfile> <stale_s> <cmd...>: kill on stale NON-EMPTY log.
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

state_step() {   # <dir with train_state.npz> -> global step (0 if absent)
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

# --- stage 0 ---------------------------------------------------------------
log "probing for TPU claim..."
wait_tpu || { log "no TPU before deadline; aborting"; exit 1; }
log "TPU responsive"

# --- stage P: BEST-RQ pretrain ---------------------------------------------
mkdir -p "$PRE"
while before_deadline; do
  DONE=$(state_step "$PRE/last")
  [ "$DONE" -ge "$PRE_STEPS" ] && { log "stage P complete ($DONE steps)"; break; }
  wait_tpu || break
  SECS=$(secs_to_deadline)
  RESUME=""
  [ -d "$PRE/last/asr" ] && RESUME="--resume-from $PRE/last"
  log "stage P: BEST-RQ pretrain from step $DONE (cap ${SECS}s)"
  run_watched "$PRE/metrics.jsonl" 1500 \
    timeout "$SECS" python -u -m omnilingual_asr_tpu.train.pretrain_cli \
      --steps "$SEG_STEPS" --total-steps "$PRE_STEPS" --batch-size 64 \
      --lr 2e-3 --warmup-steps 500 --real-fraction 0.5 \
      --d-model 512 --n-layers 12 --n-heads 8 \
      --ckpt-dir "$PRE" --save-every 500 $RESUME \
      --metrics-log "$PRE/metrics.jsonl" > "$PRE/train.log" 2>&1
  rc=$?
  log "stage P segment rc=$rc (now at step $(state_step "$PRE/last"))"
  # rc 0 with no progress and no resume dir would loop forever; guard:
  NEW=$(state_step "$PRE/last")
  [ "$rc" != "97" ] && [ "$NEW" -le "$DONE" ] && { log "stage P stuck (no progress, rc=$rc); moving on"; break; }
done

INIT_ARGS=""
if [ "${R4_USE_PRETRAIN:-1}" = "1" ] && [ -d "$PRE/last/asr" ]; then
  INIT_ARGS="--init-encoder $PRE/last/asr"
  log "flagship will warm-start from $PRE/last/asr"
else
  # Measured (12:14): the 1000-step BEST-RQ init put the CTC in the
  # round-2 plateau (ctc 2.4-3.5 bouncing, frame-CE above uniform) where
  # the from-scratch recipe descends cleanly (r3: ctc 0.35 @ 700).
  # R4_USE_PRETRAIN=0 runs the known-good scratch recipe.
  log "flagship trains from scratch (pretrain init off or absent)"
fi

# --- stage D: flagship d512x12, segmented with full-state resume ------------
mkdir -p "$FLAG"
while before_deadline; do
  DONE=$(state_step "$FLAG/last")
  [ "$DONE" -ge "$FLAG_STEPS" ] && { log "stage D complete ($DONE steps)"; break; }
  wait_tpu || break
  SECS=$(secs_to_deadline)
  [ "$SECS" -lt 900 ] && { log "stage D: <15 min left, stopping"; break; }
  if [ -d "$FLAG/last/asr" ]; then
    ARGS="--resume-from $FLAG/last"
  else
    ARGS="--d-model 512 --n-layers 12 --n-heads 8 $INIT_ARGS"
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

# --- stage G: promotion gate -------------------------------------------------
# Shipped-release trainer-level baselines (TRAINING_NOTES round-3 session-4):
# synth WER 0.0703, gettysburg held-out CER 0.6667.
TRUNK=""
if [ -d "$FLAG/best/asr" ]; then
  read -r FW FC <<< "$(metrics_best "$FLAG/best/eval.json")"
  log "stage G: flagship best synth WER $FW, gettysburg CER $FC (gate: <=0.0703 AND <=0.6667)"
  if python -c "
import sys
w, c = float('$FW'), float('$FC')
sys.exit(0 if (w <= 0.0703 and c <= 0.6667) else 1)
" 2>/dev/null; then
    TRUNK="$FLAG/best"
    log "stage G: flagship PROMOTED"
  else
    log "stage G: flagship NOT promoted (release stands)"
  fi
else
  log "stage G: no flagship best/ checkpoint"
fi

# --- stage S: summarizer fine-tune on the promoted trunk ---------------------
if [ -n "$TRUNK" ] && before_deadline; then
  wait_tpu && {
    log "stage S: summarizer fine-tune on $TRUNK"
    timeout 5400 python -u -m omnilingual_asr_tpu.train.summary_train \
        --ckpt "$TRUNK/asr" --out "$TRUNK/summarizer_ft" \
        --steps 3000 > "$TRUNK/summary_train.log" 2>&1
    log "stage S rc=$?"
  }
fi

# --- stage R: release export --------------------------------------------------
if [ -n "$TRUNK" ]; then
  log "stage R: export release from $TRUNK"
  if [ -d "$TRUNK/summarizer_ft" ]; then
    rm -rf "$TRUNK/summarizer"; mv "$TRUNK/summarizer_ft" "$TRUNK/summarizer"
  fi
  # keep the (independently gated) shipped xvector; the old d256-dim
  # translator npz CANNOT ride a d512 release (decoder width = d_model),
  # so stage T below retrains it under the new release config.
  cp checkpoints/release/xvector.npz /tmp/r4_keep_xvector.npz 2>/dev/null
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/make_release.py --ckpt "$TRUNK" \
      --out checkpoints/release > /tmp/make_release_r4.log 2>&1
  rc=$?
  [ -f /tmp/r4_keep_xvector.npz ] && cp /tmp/r4_keep_xvector.npz checkpoints/release/xvector.npz
  log "stage R rc=$rc: $(ls checkpoints/release)"
fi

# --- stage T: text translator on the round-4 corpus --------------------------
# Runs AFTER stage R: PipelineConfig.from_env() adopts the (possibly new)
# release dims, so the trained decoder matches the shipped trunk width.
if before_deadline; then
  wait_tpu && {
    TOUT=checkpoints/r4_translator
    mkdir -p "$TOUT"
    log "stage T: text-mode translator (reordering/morphology corpus)"
    timeout 3600 python -u -m omnilingual_asr_tpu.train.text_translator_train \
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

# --- stage E: eval battery ------------------------------------------------------
if before_deadline; then
  wait_tpu && {
    EV_TRUNK=$TRUNK
    if [ -z "$EV_TRUNK" ]; then
      # no promotion: evaluate the shipped release via a reconstructed
      # trainer-format trunk (run_evals expects <trunk>/asr)
      EV_TRUNK=checkpoints/r4_release_seed
      env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python tools/seed_from_release.py --out "$EV_TRUNK" \
        > /tmp/seed_r4.log 2>&1
    fi
    log "stage E: eval battery on $EV_TRUNK (trimmed, r4_evals.sh)"
    mkdir -p evals/r4
    bash tools/r4_evals.sh "$EV_TRUNK" evals/r4 > /tmp/run_evals_r4.log 2>&1
    log "evals: $(ls evals/r4)"

    # stage V2: eigengap speaker-count stopping vs threshold stopping —
    # flip the shipped default only if the measurement wins on BOTH DER
    # and count accuracy (VERDICT r3 #5). diar_eigengap.json was produced
    # by r4_evals.sh above.
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
