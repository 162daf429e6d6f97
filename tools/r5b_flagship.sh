#!/bin/bash
# Round-5 session queue (r5b): extension cycle for the d512x12 flagship.
#
# Reading of the r5 warm run (checkpoints/r5_d512x12/metrics*):
#   synth WER descends ~0.021/1000 steps while lr >= ~1.2e-4 and plateaus
#   once the cosine decays below that (0.297 -> 0.17 over steps 0-6000,
#   flat 0.17-0.19 for 6000-8000 at lr 1.2e-4 -> 2e-5). The decay tail of
#   the 9000-step schedule buys nothing; what the trunk needs is another
#   cycle with a LONGER horizon so the lr stays moderate longer.
#
#   B. extension run: params-only warm restart from r5_d512x12/last
#      (step 8000, synth WER 0.1725), fresh cosine peak 6e-4 over
#      R5B_EXT_STEPS (default 15000), same round-4 stage-D data mix.
#   X. after every segment: f16 seed export -> checkpoints/r5_d512x12_seed
#      + git commit (re-image safety; .gitignore now allows it)
#   F. English-transfer contingency (only from synth WER <= 0.09)
#   G. promotion gate: synth WER <= 0.0703 AND gettysburg CER <= 0.6667
#   S. summarizer fine-tune at the promoted width
#   R. release export (keeps shipped xvector)
#   T. text translator at release width (rerun; the r5 run was killed
#      at step 11300/24000 before any checkpoint was written)
#
#   setsid nohup bash tools/r5b_flagship.sh >> /tmp/r5b.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

NOW=$(date +%s)
EXT_DEADLINE=${R5B_EXT_DEADLINE:-$((NOW + 16200))}    # 4.5 h for the cycle
F_DEADLINE=${R5B_F_DEADLINE:-$((NOW + 19800))}        # +1 h for en_ft
DEADLINE_EPOCH=${R5B_DEADLINE_EPOCH:-$((NOW + 25200))} # 7 h hard stop

SRC0=checkpoints/r5_d512x12/last
EXT=checkpoints/r5b_ext
ENFT=checkpoints/r5b_en_ft
EXT_STEPS=${R5B_EXT_STEPS:-15000}
ENFT_STEPS=${R5B_ENFT_STEPS:-2000}
SEG_STEPS=${R5B_SEG_STEPS:-3000}

log() { echo "[r5b $(date +%H:%M:%S)] $*"; }
before() { [ "$(date +%s)" -lt "$1" ]; }
secs_to() {
  local s=$(( $1 - $(date +%s) ))
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
    before "$DEADLINE_EPOCH" || return 1
    log "TPU unclaimable; retry in 3 min"
    sleep 180
  done
  return 0
}

run_watched() {  # <logfile> <stale_s> <cmd...>
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

best_synth_wer() {  # <metrics.jsonl...> -> min synth WER seen
  python - "$@" <<'PY'
import json, sys, pathlib
w = float("inf")
for a in sys.argv[1:]:
    p = pathlib.Path(a)
    if not p.exists():
        continue
    for line in p.read_text().splitlines():
        try:
            e = json.loads(line).get("eval", {})
            w = min(w, e.get("synth", {}).get("wer", w))
        except Exception:
            pass
print(w)
PY
}

passes_gate() {  # <wer> <cer>
  python -c "
import sys
w, c = float('$1'), float('$2')
sys.exit(0 if (w <= 0.0703 and c <= 0.6667) else 1)
" 2>/dev/null
}

export_seed() {  # <trunk-with-asr/> <out-dir>
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python - "$1" "$2" <<'PY'
import sys
from pathlib import Path
sys.path.insert(0, "/root/repo")
from omnilingual_asr_tpu.config import config_for_checkpoint
from omnilingual_asr_tpu.models.zoo import load_checkpoint, save_release
src, outd = Path(sys.argv[1]), Path(sys.argv[2])
cfg = config_for_checkpoint(str(src / "asr"))
params = load_checkpoint(src / "asr", cfg)
outd.mkdir(parents=True, exist_ok=True)
save_release(outd / "asr.npz", params)
(outd / "config.json").write_text(cfg.to_json())
print(f"seed exported: {outd}")
PY
}

commit_seed() {  # <src-trunk> <label>
  export_seed "$1" checkpoints/r5_d512x12_seed >> /tmp/r5b_seed.log 2>&1
  cp "$1/eval.json" checkpoints/r5_d512x12_seed/eval.json 2>/dev/null
  git add checkpoints/r5_d512x12_seed >/dev/null 2>&1 \
    && git commit -q -m "r5 flagship seed: $2" \
    && log "seed committed ($2)"
}

# --- stage B: extension cycle --------------------------------------------------
mkdir -p "$EXT"
while before "$EXT_DEADLINE"; do
  DONE=$(state_step "$EXT/last")
  [ "$DONE" -ge "$EXT_STEPS" ] && { log "stage B complete ($DONE steps)"; break; }
  # stop early if the gate is already passed (best/ only exists under the cap)
  if [ -d "$EXT/best/asr" ]; then
    read -r BW BC <<< "$(metrics_best "$EXT/best/eval.json")"
    if passes_gate "$BW" "$BC"; then
      log "stage B: gate already passed (WER $BW CER $BC) — stopping the cycle"
      break
    fi
  fi
  wait_tpu || break
  DONE=$(state_step "$EXT/last")
  [ "$DONE" -ge "$EXT_STEPS" ] && { log "stage B complete ($DONE steps)"; break; }
  SECS=$(secs_to "$EXT_DEADLINE")
  [ "$SECS" -lt 600 ] && { log "stage B: <10 min left, stopping"; break; }
  if [ -d "$EXT/last/asr" ]; then
    ARGS="--resume-from $EXT/last"
  else
    ARGS="--resume-from $SRC0 --no-resume-opt"
  fi
  log "stage B: ext segment from step $DONE (cap ${SECS}s)"
  run_watched "$EXT/metrics.jsonl" 1500 \
    timeout "$SECS" python -u -m omnilingual_asr_tpu.train.synth_train \
      --steps "$SEG_STEPS" --total-steps "$EXT_STEPS" --batch-size 64 \
      --lr 6e-4 --warmup-steps 200 $ARGS \
      --aux-ramp-start 1 --aux-ramp-steps 1 \
      --english-fraction 0.35 --voice-match 0.5 --english-sentences 0.65 \
      --real-fraction 0.2 --real-match 0.5 --channel-aug 0.25 \
      --speed-perturb 0.1 --wire mulaw \
      --device-pool 2048 --pool-refresh-every 150 \
      --select transfer --select-synth-cap 0.0703 \
      --eval-every 500 --ckpt-dir "$EXT" \
      --metrics-log "$EXT/metrics.jsonl" > "$EXT/train.log" 2>&1
  rc=$?
  NEW=$(state_step "$EXT/last")
  log "stage B segment rc=$rc (step $DONE -> $NEW)"
  if [ "$NEW" -gt "$DONE" ]; then
    SRCX="$EXT/last"; [ -d "$EXT/best/asr" ] && SRCX="$EXT/best"
    commit_seed "$SRCX" "ext step $NEW"
  fi
  [ "$rc" != "97" ] && [ "$NEW" -le "$DONE" ] && { log "stage B stuck (no progress, rc=$rc); stopping"; break; }
done

# --- stage F: English-transfer contingency -------------------------------------
NEED_FT=1
SRC=""
if [ -d "$EXT/best/asr" ]; then
  read -r FW FC <<< "$(metrics_best "$EXT/best/eval.json")"
  log "stage F check: ext best synth WER $FW, gettysburg CER $FC"
  if passes_gate "$FW" "$FC"; then
    NEED_FT=0
    log "stage F: skipped — ext best already passes the gate"
  else
    SRC="$EXT/best"
  fi
else
  LW=$(best_synth_wer "$EXT"/metrics.jsonl*)
  log "stage F check: no best/; min ext synth WER $LW"
  if python -c "exit(0 if float('$LW') <= 0.09 else 1)" 2>/dev/null; then
    SRC="$EXT/last"
  else
    NEED_FT=0
    log "stage F: skipped — trunk too weak for the English-heavy shift (measured r4)"
  fi
fi
if [ "$NEED_FT" = "1" ] && [ -n "$SRC" ]; then
  mkdir -p "$ENFT"
  while before "$F_DEADLINE"; do
    DONE=$(state_step "$ENFT/last")
    [ "$DONE" -ge "$ENFT_STEPS" ] && { log "stage F complete ($DONE steps)"; break; }
    wait_tpu || break
    DONE=$(state_step "$ENFT/last")
    [ "$DONE" -ge "$ENFT_STEPS" ] && { log "stage F complete ($DONE steps)"; break; }
    SECS=$(secs_to "$F_DEADLINE")
    [ "$SECS" -lt 600 ] && { log "stage F: <10 min left, stopping"; break; }
    if [ -d "$ENFT/last/asr" ]; then
      ARGS="--resume-from $ENFT/last"
    else
      ARGS="--resume-from $SRC --no-resume-opt"
    fi
    log "stage F: en_ft segment from step $DONE (src $SRC, cap ${SECS}s)"
    run_watched "$ENFT/metrics.jsonl" 1500 \
      timeout "$SECS" python -u -m omnilingual_asr_tpu.train.synth_train \
        --steps "$SEG_STEPS" --total-steps "$ENFT_STEPS" --batch-size 64 \
        --lr 4e-4 --warmup-steps 100 $ARGS \
        --aux-ramp-start 1 --aux-ramp-steps 1 \
        --english-fraction 0.45 --voice-match 0.5 --english-sentences 0.65 \
        --real-fraction 0.2 --real-match 0.5 --channel-aug 0.25 \
        --speed-perturb 0.1 --wire mulaw \
        --device-pool 2048 --pool-refresh-every 150 \
        --select transfer --select-synth-cap 0.0703 \
        --eval-every 250 --ckpt-dir "$ENFT" \
        --metrics-log "$ENFT/metrics.jsonl" > "$ENFT/train.log" 2>&1
    rc=$?
    NEW=$(state_step "$ENFT/last")
    log "stage F segment rc=$rc (step $DONE -> $NEW)"
    [ "$rc" != "97" ] && [ "$NEW" -le "$DONE" ] && { log "stage F stuck (no progress, rc=$rc); stopping"; break; }
  done
fi

# --- stage G: promotion gate over both candidates ------------------------------
TRUNK=""
BEST_CER="inf"
for CAND in "$ENFT/best" "$EXT/best"; do
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

# --- stage S: summarizer fine-tune at the promoted width -----------------------
if [ -n "$TRUNK" ] && before "$DEADLINE_EPOCH"; then
  wait_tpu && {
    SECS=$(secs_to "$DEADLINE_EPOCH"); [ "$SECS" -gt 1500 ] && SECS=1500
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
  cp checkpoints/release/xvector.npz /tmp/r5_keep_xvector.npz 2>/dev/null
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/make_release.py --ckpt "$TRUNK" \
      --out checkpoints/release > /tmp/make_release_r5b.log 2>&1
  rc=$?
  [ -f /tmp/r5_keep_xvector.npz ] && cp /tmp/r5_keep_xvector.npz checkpoints/release/xvector.npz
  log "stage R rc=$rc: $(ls checkpoints/release)"
  git add checkpoints/release >/dev/null 2>&1 \
    && git commit -q -m "Promote trained d512x12 flagship to checkpoints/release" \
    && log "stage R committed"
fi

# --- stage T: text translator at the shipped release width ---------------------
if before "$DEADLINE_EPOCH" && [ "$(secs_to "$DEADLINE_EPOCH")" -gt 900 ]; then
  wait_tpu && {
    TOUT=checkpoints/r5_translator
    mkdir -p "$TOUT"
    SECS=$(secs_to "$DEADLINE_EPOCH"); [ "$SECS" -gt 2700 ] && SECS=2700
    log "stage T: text-mode translator (cap ${SECS}s)"
    timeout "$SECS" python -u -m omnilingual_asr_tpu.train.text_translator_train \
        --steps 24000 --batch-size 128 --lr 1e-3 \
        --out "$TOUT" --metrics-log "$TOUT/metrics.jsonl" \
        > "$TOUT/train.log" 2>&1
    log "stage T rc=$?"
    ACC=$(python - <<'PY'
import json, pathlib
acc = 0.0
p = pathlib.Path("checkpoints/r5_translator/metrics.jsonl")
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
params = load_translator("checkpoints/r5_translator", cfg, n_layers=4)
save_release("checkpoints/release/translator.npz", params)
PY
      git add checkpoints/release/translator.npz >/dev/null 2>&1 \
        && git commit -q -m "Ship text translator at release width" || true
    fi
  }
fi

log "r5b queue done"
