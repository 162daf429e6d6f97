#!/bin/bash
# Round-5 queue: finish the d512x12 flagship from the committed step-10k
# seed (NEXT.md round-5 plan item 1), then run the trunk-dependent tail.
#
#   W. reconstruct a trainer trunk from checkpoints/r4_d512x12_seed (CPU)
#   D. warm-start supervised run: params-only resume, fresh cosine
#      lr 6e-4 over R5_FLAG_STEPS, the round-4 stage-D data mix,
#      select=transfer with the gate's own synth cap
#   X. persist the trunk as an f16 npz seed + git commit (re-image safety)
#   F. contingency English-transfer push if D misses the gate but got close
#   G. promotion gate: synth WER <= 0.0703 AND gettysburg CER <= 0.6667
#      (the shipped d256 release's own trainer-level numbers)
#   S. summarizer fine-tune at the promoted width (save-on-timeout)
#   R. release export (keeps the shipped xvector)
#   T. text translator at the promoted width (best-so-far survives timeout)
#   E. trimmed eval battery into evals/r4
#
#   setsid nohup bash tools/r5_queue.sh >> /tmp/r5_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

NOW=$(date +%s)
DEADLINE_EPOCH=${R5_DEADLINE_EPOCH:-$((NOW + 9900))}
D_DEADLINE=${R5_D_DEADLINE:-$((NOW + 4800))}
F_DEADLINE=${R5_F_DEADLINE:-$((NOW + 6420))}

SEED=checkpoints/r4_d512x12_seed
FLAG=checkpoints/r5_d512x12
ENFT=checkpoints/r5_en_ft
TRUNK0=$FLAG/warmseed
FLAG_STEPS=${R5_FLAG_STEPS:-9000}
ENFT_STEPS=${R5_ENFT_STEPS:-2000}
SEG_STEPS=${R5_SEG_STEPS:-3000}

log() { echo "[r5 $(date +%H:%M:%S)] $*"; }
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
  # Kill on EITHER (a) a stale non-empty log, or (b) an empty log past the
  # max observed clean startup (wedge signature (b) never writes a line).
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

last_eval_wer() {  # <metrics.jsonl> -> latest synth WER seen (inf if none)
  python - "$1" <<'PY'
import json, sys, pathlib
w = float("inf")
p = pathlib.Path(sys.argv[1])
if p.exists():
    for line in p.read_text().splitlines():
        try:
            e = json.loads(line).get("eval", {})
            w = e.get("synth", {}).get("wer", w)
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

# --- stage W: reconstruct the warm-start trunk from the committed seed --------
if [ ! -d "$TRUNK0/asr" ]; then
  log "stage W: reconstructing trainer trunk from $SEED"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/seed_from_release.py --release "$SEED" --out "$TRUNK0" \
    > /tmp/r5_seed.log 2>&1
  log "stage W rc=$? ($(ls "$TRUNK0" 2>/dev/null))"
fi
[ -d "$TRUNK0/asr" ] || { log "stage W FAILED — no trunk; aborting"; exit 1; }

# --- stage D: warm-start flagship run -----------------------------------------
mkdir -p "$FLAG"
while before "$D_DEADLINE"; do
  DONE=$(state_step "$FLAG/last")
  [ "$DONE" -ge "$FLAG_STEPS" ] && { log "stage D complete ($DONE steps)"; break; }
  wait_tpu || break
  DONE=$(state_step "$FLAG/last")
  [ "$DONE" -ge "$FLAG_STEPS" ] && { log "stage D complete ($DONE steps)"; break; }
  SECS=$(secs_to "$D_DEADLINE")
  [ "$SECS" -lt 600 ] && { log "stage D: <10 min left, stopping"; break; }
  if [ -d "$FLAG/last/asr" ]; then
    ARGS="--resume-from $FLAG/last"
  else
    ARGS="--resume-from $TRUNK0 --no-resume-opt"
  fi
  log "stage D: flagship warm segment from step $DONE (cap ${SECS}s)"
  run_watched "$FLAG/metrics.jsonl" 1500 \
    timeout "$SECS" python -u -m omnilingual_asr_tpu.train.synth_train \
      --steps "$SEG_STEPS" --total-steps "$FLAG_STEPS" --batch-size 64 \
      --lr 6e-4 --warmup-steps 200 $ARGS \
      --aux-ramp-start 1 --aux-ramp-steps 1 \
      --english-fraction 0.35 --voice-match 0.5 --english-sentences 0.65 \
      --real-fraction 0.2 --real-match 0.5 --channel-aug 0.25 \
      --speed-perturb 0.1 --wire mulaw \
      --device-pool 2048 --pool-refresh-every 150 \
      --select transfer --select-synth-cap 0.0703 \
      --eval-every 500 --ckpt-dir "$FLAG" \
      --metrics-log "$FLAG/metrics.jsonl" > "$FLAG/train.log" 2>&1
  rc=$?
  NEW=$(state_step "$FLAG/last")
  log "stage D segment rc=$rc (step $DONE -> $NEW)"
  [ "$rc" != "97" ] && [ "$NEW" -le "$DONE" ] && { log "stage D stuck (no progress, rc=$rc); stopping"; break; }
done

# --- stage X1: persist + commit the warm trunk for the next round -------------
XSRC=""
[ -d "$FLAG/last/asr" ] && XSRC="$FLAG/last"
[ -d "$FLAG/best/asr" ] && XSRC="$FLAG/best"
if [ -n "$XSRC" ]; then
  log "stage X1: exporting $XSRC -> checkpoints/r5_d512x12_seed"
  export_seed "$XSRC" checkpoints/r5_d512x12_seed >> /tmp/r5_seed.log 2>&1
  cp "$XSRC/eval.json" checkpoints/r5_d512x12_seed/eval.json 2>/dev/null
  git add checkpoints/r5_d512x12_seed >/dev/null 2>&1 \
    && git commit -q -m "Commit r5 d512x12 warm-run seed (step $(state_step "$FLAG/last"))" \
    && log "stage X1 committed"
fi

# --- stage F: English-transfer contingency ------------------------------------
NEED_FT=1
SRC=""
if [ -d "$FLAG/best/asr" ]; then
  read -r FW FC <<< "$(metrics_best "$FLAG/best/eval.json")"
  log "stage F check: main best synth WER $FW, gettysburg CER $FC"
  if passes_gate "$FW" "$FC"; then
    NEED_FT=0
    log "stage F: skipped — main run already passes the gate"
  else
    SRC="$FLAG/best"
  fi
else
  LW=$(last_eval_wer "$FLAG/metrics.jsonl")
  log "stage F check: no best/; last synth WER $LW"
  if python -c "exit(0 if float('$LW') <= 0.09 else 1)" 2>/dev/null; then
    SRC="$FLAG/last"
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

# --- stage R: release export ----------------------------------------------------
if [ -n "$TRUNK" ]; then
  log "stage R: export release from $TRUNK"
  if [ -d "$TRUNK/summarizer_ft" ]; then
    rm -rf "$TRUNK/summarizer"; mv "$TRUNK/summarizer_ft" "$TRUNK/summarizer"
  fi
  # The warmseed's random-init translator must not ship: drop it unless a
  # text-mode translator was actually trained into this trunk.
  cp checkpoints/release/xvector.npz /tmp/r5_keep_xvector.npz 2>/dev/null
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/make_release.py --ckpt "$TRUNK" \
      --out checkpoints/release > /tmp/make_release_r5.log 2>&1
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
    SECS=$(secs_to "$DEADLINE_EPOCH"); [ "$SECS" -gt 1800 ] && SECS=1800
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

# --- stage E: trimmed eval battery ----------------------------------------------
if before "$DEADLINE_EPOCH" && [ "$(secs_to "$DEADLINE_EPOCH")" -gt 600 ]; then
  wait_tpu && {
    EV_TRUNK=$TRUNK
    if [ -z "$EV_TRUNK" ]; then
      EV_TRUNK=checkpoints/r5_release_seed
      env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python tools/seed_from_release.py --out "$EV_TRUNK" \
        > /tmp/seed_r5.log 2>&1
    fi
    SECS=$(secs_to "$DEADLINE_EPOCH")
    log "stage E: eval battery on $EV_TRUNK (cap ${SECS}s)"
    mkdir -p evals/r4
    timeout "$SECS" bash tools/r4_evals.sh "$EV_TRUNK" evals/r4 \
      > /tmp/run_evals_r5.log 2>&1
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
    git add evals/r4 checkpoints/release/config.json >/dev/null 2>&1 \
      && git commit -q -m "Round-4 eval battery artifacts" || true
  }
fi

log "queue done"
