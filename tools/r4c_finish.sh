#!/bin/bash
# Round-4 finish: stages G/S/R/T/E extracted from tools/r4b_queue.sh so the
# en_ft stage can be cut to one segment when the clock demands it (kill the
# r4b queue after the en_ft segment exits, then run this).
#
# Adds stage X: export the (unpromoted) flagship trunk params as a
# committed f16 npz so round 5 warm-starts instead of burning 4h from
# scratch — the host is re-imaged between rounds; only git survives.
#
#   setsid nohup bash tools/r4c_finish.sh >> /tmp/r4_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

DEADLINE_EPOCH=${R4_DEADLINE_EPOCH:-1787188500}
FLAG=checkpoints/r4_d512x12
ENFT=checkpoints/r4_en_ft

log() { echo "[r4c $(date +%H:%M:%S)] $*"; }
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
metrics_best() {
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
passes_gate() {
  python -c "
import sys
w, c = float('$1'), float('$2')
sys.exit(0 if (w <= 0.0703 and c <= 0.6667) else 1)
" 2>/dev/null
}

# --- stage X: persist the flagship trunk for round 5 --------------------------
for SRC_NAME in r4_d512x12 r4_en_ft; do
  SRC=checkpoints/$SRC_NAME
  PICK=""
  [ -d "$SRC/last/asr" ] && PICK="$SRC/last"
  [ -d "$SRC/best/asr" ] && PICK="$SRC/best"
  [ -z "$PICK" ] && continue
  OUTD=checkpoints/${SRC_NAME}_seed
  log "stage X: exporting $PICK -> $OUTD (f16 npz warm-start seed)"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python - "$PICK" "$OUTD" <<'PY'
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
  log "stage X rc=$? ($OUTD)"
done

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
