#!/bin/bash
# Round-5d queue — relaunch of the r5c plan after the host restart wiped
# the uncommitted training state (r5b_ext/, r5c_d256/). Differences from
# tools/r5c_queue.sh:
#   - stage X seeds from the COMMITTED f16 seed checkpoints/r5_d512x12_seed
#     (params-only --no-resume-opt restart; the orbax train state is gone)
#   - deadlines sized for one ~8h session
#   - stage P exports a committed d256 seed either way (crash safety)
#
#   setsid nohup bash tools/r5d_queue.sh >> /tmp/r5d.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

NOW=$(date +%s)
P_DEADLINE=${R5D_P_DEADLINE:-$((NOW + 5400))}
TAIL_DEADLINE=${R5D_TAIL_DEADLINE:-$((NOW + 14400))}
X_DEADLINE=${R5D_X_DEADLINE:-$((NOW + 26100))}
DEADLINE_EPOCH=${R5D_DEADLINE_EPOCH:-$((NOW + 27900))}

P256=checkpoints/r5c_d256
DX=checkpoints/r5c_d512reg
P_STEPS=${R5D_P_STEPS:-6000}
X_STEPS=${R5D_X_STEPS:-12000}
SEG_STEPS=${R5D_SEG_STEPS:-3000}

log() { echo "[r5d $(date +%H:%M:%S)] $*"; }
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

passes_gate() {  # <wer> <cer>
  python -c "
import sys
w, c = float('$1'), float('$2')
sys.exit(0 if (w <= 0.0703 and c <= 0.6667) else 1)
" 2>/dev/null
}

export_seed() {  # <trunk-with-asr/> <outdir>
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

train_seg_loop() {  # <ckpt> <total_steps> <deadline> <src_trunk> <extra args...>
  local CK=$1 TOTAL=$2 DL=$3 SRC=$4; shift 4
  mkdir -p "$CK"
  while before "$DL"; do
    local DONE=$(state_step "$CK/last")
    [ "$DONE" -ge "$TOTAL" ] && { log "$CK complete ($DONE steps)"; break; }
    wait_tpu || break
    DONE=$(state_step "$CK/last")
    [ "$DONE" -ge "$TOTAL" ] && { log "$CK complete ($DONE steps)"; break; }
    local SECS=$(secs_to "$DL")
    [ "$SECS" -lt 600 ] && { log "$CK: <10 min left, stopping"; break; }
    local ARGS
    if [ -d "$CK/last/asr" ]; then
      ARGS="--resume-from $CK/last"
    else
      ARGS="--resume-from $SRC --no-resume-opt"
    fi
    log "$CK: segment from step $DONE (cap ${SECS}s)"
    run_watched "$CK/metrics.jsonl" 1500 \
      timeout "$SECS" python -u -m omnilingual_asr_tpu.train.synth_train \
        --steps "$SEG_STEPS" --total-steps "$TOTAL" --batch-size 64 \
        $ARGS \
        --aux-ramp-start 1 --aux-ramp-steps 1 \
        --english-fraction 0.35 --voice-match 0.5 --english-sentences 0.65 \
        --real-fraction 0.2 --real-match 0.5 --channel-aug 0.25 \
        --speed-perturb 0.1 --wire mulaw \
        --select transfer --select-synth-cap 0.0703 \
        --ckpt-dir "$CK" --metrics-log "$CK/metrics.jsonl" \
        "$@" > "$CK/train.log" 2>&1
    local rc=$?
    local NEW=$(state_step "$CK/last")
    log "$CK segment rc=$rc (step $DONE -> $NEW)"
    [ "$rc" != "97" ] && [ "$NEW" -le "$DONE" ] && { log "$CK stuck (rc=$rc); stopping"; break; }
  done
}

promote() {  # <trunk> <label>
  local TRUNK=$1 LABEL=$2
  if before "$DEADLINE_EPOCH"; then
    wait_tpu && {
      local SECS=$(secs_to "$DEADLINE_EPOCH"); [ "$SECS" -gt 1500 ] && SECS=1500
      log "summarizer fine-tune on $TRUNK (cap ${SECS}s)"
      timeout "$SECS" python -u -m omnilingual_asr_tpu.train.summary_train \
          --ckpt "$TRUNK/asr" --out "$TRUNK/summarizer_ft" \
          --steps 3000 > "$TRUNK/summary_train.log" 2>&1
      log "summarizer rc=$?"
    }
  fi
  if [ -d "$TRUNK/summarizer_ft" ]; then
    rm -rf "$TRUNK/summarizer"; mv "$TRUNK/summarizer_ft" "$TRUNK/summarizer"
  fi
  cp checkpoints/release/xvector.npz /tmp/r5d_keep_xvector.npz 2>/dev/null
  cp checkpoints/release/translator.npz /tmp/r5d_keep_translator.npz 2>/dev/null
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/make_release.py --ckpt "$TRUNK" \
      --out checkpoints/release > /tmp/make_release_r5d.log 2>&1
  local rc=$?
  [ -f /tmp/r5d_keep_xvector.npz ] && cp /tmp/r5d_keep_xvector.npz checkpoints/release/xvector.npz
  # the trunk's joint-trained audio translator must not clobber the
  # shipped TEXT translator; restore unless the trunk shipped a text one
  if [ -f /tmp/r5d_keep_translator.npz ] && ! grep -q "translator.npz" /tmp/make_release_r5d.log; then
    cp /tmp/r5d_keep_translator.npz checkpoints/release/translator.npz
  fi
  log "release export rc=$rc: $(ls checkpoints/release)"
  git add checkpoints/release >/dev/null 2>&1 \
    && git commit -q -m "Promote $LABEL to checkpoints/release" \
    && log "release committed ($LABEL)"
}

# --- stage P: d256 refresher ---------------------------------------------------
if [ ! -d "$P256/warmseed/asr" ]; then
  log "stage P: trunk from shipped release"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/seed_from_release.py --out "$P256/warmseed" \
    > /tmp/r5d_seed.log 2>&1
  log "stage P seed rc=$? ($(ls "$P256/warmseed" 2>/dev/null))"
fi
if [ -d "$P256/warmseed/asr" ]; then
  train_seg_loop "$P256" "$P_STEPS" "$P_DEADLINE" "$P256/warmseed" \
    --lr 5e-4 --warmup-steps 100 \
    --device-pool 2048 --pool-refresh-every 150 --eval-every 250
else
  log "stage P FAILED: no trunk"
fi

# --- stage G1: gate + promote the d256 refresher -------------------------------
if [ -d "$P256/best/asr" ]; then
  read -r W C <<< "$(metrics_best "$P256/best/eval.json")"
  log "stage G1: P256 best synth WER $W, gettysburg CER $C"
  export_seed "$P256/best" checkpoints/r5_d256_seed >> /tmp/r5d_seed.log 2>&1
  cp "$P256/best/eval.json" checkpoints/r5_d256_seed/eval.json 2>/dev/null
  git add checkpoints/r5_d256_seed >/dev/null 2>&1 \
    && git commit -q -m "d256 refresher seed (synth WER $W, gettysburg CER $C)" || true
  if passes_gate "$W" "$C"; then
    promote "$P256/best" "refreshed d256 (synth WER $W, gettysburg CER $C)"
  else
    log "stage G1: refresher does not pass; release stands"
  fi
else
  log "stage G1: no best/ under the synth cap; release stands"
fi

# --- stage T: text translator (template-split corpus) --------------------------
if before "$TAIL_DEADLINE"; then
  wait_tpu && {
    TOUT=checkpoints/r5_translator
    mkdir -p "$TOUT"
    SECS=$(secs_to "$TAIL_DEADLINE"); [ "$SECS" -gt 2700 ] && SECS=2700
    log "stage T: text-mode translator (cap ${SECS}s)"
    # metrics/train logs live OUTSIDE $TOUT: the trainer's orbax save
    # replaces the $TOUT directory wholesale (measured: stage T this round
    # destroyed its own metrics log and failed the ship gate on acc 0.0)
    timeout "$SECS" python -u -m omnilingual_asr_tpu.train.text_translator_train \
        --steps 24000 --batch-size 128 --lr 1e-3 \
        --out "$TOUT" --metrics-log "$TOUT.metrics.jsonl" \
        > "$TOUT.train.log" 2>&1
    log "stage T rc=$?"
    ACC=$(python - <<'PY'
import json, pathlib
acc = 0.0
p = pathlib.Path("checkpoints/r5_translator.metrics.jsonl")
if p.exists():
    for line in p.read_text().splitlines():
        try:
            e = json.loads(line).get("eval", {})
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
        && git commit -q -m "Ship text translator (template-held-out corpus)" || true
    fi
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tools/translation_artifact.py \
        --metrics "$TOUT.metrics.jsonl" --out evals/r5/translation.json \
        >> /tmp/r5d.log 2>&1
    git add evals/r5/translation.json >/dev/null 2>&1 \
      && git commit -q -m "Translation eval artifact (template-held-out split)" || true
  }
fi

# --- stage E: eval battery + self-run bench ------------------------------------
if before "$TAIL_DEADLINE"; then
  wait_tpu && {
    SECS=$(secs_to "$TAIL_DEADLINE")
    log "stage E: eval battery (cap ${SECS}s)"
    timeout "$SECS" bash tools/r5_evals.sh "" evals/r5 \
      > /tmp/r5d_evals.log 2>&1
    log "stage E done: $(ls evals/r5)"
  }
fi
if before "$TAIL_DEADLINE"; then
  wait_tpu && {
    log "stage B: self-run bench"
    timeout 3600 python bench.py > /tmp/r5d_bench.json 2>/tmp/r5d_bench.log
    rc=$?
    log "bench rc=$rc: $(tail -c 300 /tmp/r5d_bench.json)"
    if [ "$rc" = "0" ] && python -c "
import json, sys
d = json.loads(open('/tmp/r5d_bench.json').read().strip().splitlines()[-1])
sys.exit(0 if d.get('value', 0) and not d.get('error') else 1)
" 2>/dev/null; then
      cp /tmp/r5d_bench.json evals/r5/bench_selfrun.json
      git add evals/r5/bench_selfrun.json >/dev/null 2>&1 \
        && git commit -q -m "Self-run bench artifact (r5d tail)" || true
    fi
  }
fi

# --- stage X: regularized d512 retry from the committed f16 seed ---------------
if [ ! -d checkpoints/r5d_d512seed/asr ]; then
  log "stage X: rebuilding d512 trunk from checkpoints/r5_d512x12_seed"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/seed_from_release.py --release checkpoints/r5_d512x12_seed \
      --out checkpoints/r5d_d512seed >> /tmp/r5d_seed.log 2>&1
  log "stage X seed rc=$?"
fi
if [ -d checkpoints/r5d_d512seed/asr ]; then
  train_seg_loop "$DX" "$X_STEPS" "$X_DEADLINE" "checkpoints/r5d_d512seed" \
    --lr 8e-4 --warmup-steps 200 \
    --dropout 0.15 --weight-decay 1e-3 \
    --device-pool 2048 --pool-refresh-every 60 --eval-every 500
  XSRC=""
  [ -d "$DX/last/asr" ] && XSRC="$DX/last"
  [ -d "$DX/best/asr" ] && XSRC="$DX/best"
  if [ -n "$XSRC" ]; then
    export_seed "$XSRC" checkpoints/r5_d512x12_seed >> /tmp/r5d_seed.log 2>&1
    cp "$XSRC/eval.json" checkpoints/r5_d512x12_seed/eval.json 2>/dev/null
    git add checkpoints/r5_d512x12_seed >/dev/null 2>&1 \
      && git commit -q -m "r5 flagship seed: regularized retry ($(state_step "$DX/last") steps)" || true
  fi
fi

# --- stage G2: late promotion if the regularized d512 wins ----------------------
if [ -d "$DX/best/asr" ]; then
  read -r W C <<< "$(metrics_best "$DX/best/eval.json")"
  log "stage G2: DX best synth WER $W, gettysburg CER $C"
  REL_CER=$(python - <<'PY'
import json, pathlib
c = 0.6667
p = pathlib.Path("checkpoints/r5c_d256/best/eval.json")
try:
    c = min(c, json.loads(p.read_text())["eval"]["gettysburg_heldout"]["cer"])
except Exception:
    pass
print(c)
PY
)
  if passes_gate "$W" "$C" && python -c "exit(0 if float('$C') < float('$REL_CER') else 1)" 2>/dev/null; then
    promote "$DX/best" "regularized d512x12 (synth WER $W, gettysburg CER $C)"
    wait_tpu && {
      log "stage G2: re-running quality essentials on the new release"
      timeout 2400 python eval_synth.py --n 96 > evals/r5/synth.log 2>&1
      tail -1 evals/r5/synth.log > evals/r5/synth.json
      timeout 1800 python tools/real_goldens.py --out evals/r5/real_goldens.json \
        > evals/r5/real_goldens.log 2>&1
      git add evals/r5 >/dev/null 2>&1 \
        && git commit -q -m "Re-run quality essentials after d512 promotion" || true
    }
  else
    log "stage G2: DX does not beat the shipped CER; release stands"
  fi
fi

log "r5d queue done"
