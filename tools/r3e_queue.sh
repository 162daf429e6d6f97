#!/bin/bash
# Round-3 session-4 follow-on queue. Runs AFTER tools/r3d_queue.sh exits:
# both r3d translator attempts died on the remote-compile 413 (the memory
# bank was a jit closure constant — fixed in translator_train.py), so the
# shipped release has no translator. This queue:
#
#   0. waits for the r3d queue process to exit, then probes the TPU claim
#   T. determines the FINAL trunk (r3d stage D2 may have swapped the
#      release to a d512 rung) from checkpoints/release/config.json
#   1. translator fine-tune on that trunk (ship gate: word acc >= 0.5)
#   2. summarizer fine-tune if the trunk has none (d512 swap case)
#   3. re-export the release with the new decoders
#   4. re-run the heads eval (translator + summarizer scored through the
#      engine path) into evals/r3
#   5. with leftover budget: continue the English-transfer fine-tune at a
#      cooler lr (promotion gate: beats the release on gettysburg CER with
#      synth WER <= 0.08)
#
#   setsid nohup bash tools/r3e_queue.sh <r3d_pid> > /tmp/r3e_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

R3D_PID=${1:?usage: r3e_queue.sh <r3d queue pid>}
DEADLINE=${R3E_TPU_DEADLINE:-00:55}   # HH:MM local; no TPU stage STARTS after

log() { echo "[r3e $(date +%H:%M:%S)] $*"; }

before_deadline() {
  python - "$DEADLINE" <<'PY'
import sys, time
hh, mm = map(int, sys.argv[1].split(":"))
t = time.localtime()
now = (t.tm_hour, t.tm_min)
dl = (hh, mm)
# The deadline may be past midnight relative to an afternoon start: treat
# times < 06:00 as next-day when the deadline itself is < 06:00.
if dl < (6, 0):
    sys.exit(0 if now >= (6, 0) or now < dl else 1)
sys.exit(0 if now < dl else 1)
PY
}

probe() {
  timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()))
" > /dev/null 2>&1
}

metrics_best() {  # <eval.json> -> "synth_wer gettysburg_cer"
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

# --- stage 0: wait for r3d, then claim ------------------------------------
log "waiting for r3d queue (pid $R3D_PID) to exit..."
while kill -0 "$R3D_PID" 2>/dev/null; do sleep 60; done
log "r3d exited; waiting 30s for the claim to release"
sleep 30
log "probing for TPU claim..."
until probe; do
  log "TPU unclaimable; retry in 3 min"
  sleep 180
done
log "TPU responsive"

# --- stage T: final trunk discovery ----------------------------------------
TRUNK=$(python - <<'PY'
import json, pathlib
rel = json.loads(pathlib.Path("checkpoints/release/config.json").read_text())
d = rel["encoder"]["d_model"]
if d == 512:
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
    print(best or "checkpoints/r3_en_ft/best")
else:
    print("checkpoints/r3_en_ft/best")
PY
)
log "final trunk: $TRUNK"
[ -d "$TRUNK/asr" ] || { log "no asr/ under trunk; aborting"; exit 1; }

# --- stage 1: translator fine-tune (fixed jit-arg banks) -------------------
if before_deadline; then
  log "stage 1: translator fine-tune on $TRUNK"
  INIT=""
  [ -d "$TRUNK/translator_degenerate" ] && INIT="--init-from $TRUNK/translator_degenerate"
  [ -d "$TRUNK/translator" ] && INIT="--init-from $TRUNK/translator"
  timeout 5400 python -u -m omnilingual_asr_tpu.train.translator_train \
      --ckpt "$TRUNK/asr" $INIT \
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
    rm -rf "$TRUNK/translator"
    mv "$TRUNK/translator_ft" "$TRUNK/translator"
    log "translator promoted (acc $ACC)"
  else
    log "translator NOT shipped (acc $ACC < 0.5)"
  fi
else
  log "stage 1 skipped (past deadline)"
fi

# --- stage 2: summarizer (only if the trunk has none — d512 swap) ----------
if [ ! -d "$TRUNK/summarizer" ] && before_deadline; then
  log "stage 2: summarizer fine-tune on $TRUNK"
  timeout 5400 python -u -m omnilingual_asr_tpu.train.summary_train \
      --ckpt "$TRUNK/asr" --out "$TRUNK/summarizer" \
      --steps 3000 > "$TRUNK/summary_train.log" 2>&1
  log "summarizer rc=$?"
fi

# --- stage 3: re-export the release ----------------------------------------
log "stage 3: export release from $TRUNK"
XV=""
[ -f checkpoints/release/xvector.npz ] && XV="--xvector checkpoints/release/xvector.npz"
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python tools/make_release.py --ckpt "$TRUNK" $XV \
    --out checkpoints/release > /tmp/make_release3e.log 2>&1
log "release: $(ls checkpoints/release | tr '\n' ' ')"

# --- stage 4: heads eval with the shipped decoders --------------------------
# If r3d's stage D2 swapped the release to a d512 rung, the whole battery in
# evals/r3 still describes the en_ft trunk — re-run it on the final trunk.
if [ "$TRUNK" != "checkpoints/r3_en_ft/best" ] && before_deadline; then
  log "stage 4b: full battery re-run on swapped trunk $TRUNK"
  bash tools/run_evals.sh "$TRUNK" evals/r3 > /tmp/run_evals3e.log 2>&1
  log "evals: $(ls evals/r3 | tr '\n' ' ')"
fi
if before_deadline; then
  HEADS_TR=""
  [ -d "$TRUNK/translator" ] && HEADS_TR="--translator $TRUNK/translator"
  [ -d "$TRUNK/summarizer" ] && HEADS_TR="$HEADS_TR --summarizer $TRUNK/summarizer"
  log "stage 4: eval_heads $HEADS_TR"
  timeout 1800 python eval_heads.py --ckpt "$TRUNK/asr" $HEADS_TR --n 96 \
      > /tmp/heads3e.log 2>&1
  tail -1 /tmp/heads3e.log > evals/r3/heads.json
  log "heads: $(cat evals/r3/heads.json)"
else
  log "stage 4 skipped (past deadline)"
fi

# --- stage 5: English-transfer continuation with leftover budget -----------
FINAL=$TRUNK
if before_deadline && [ "$TRUNK" = "checkpoints/r3_en_ft/best" ]; then
  ENFT2=checkpoints/r3_en_ft2
  mkdir -p "$ENFT2"
  log "stage 5: en_ft continuation (cooler lr) from $TRUNK"
  timeout 7200 python -u -m omnilingual_asr_tpu.train.synth_train \
      --steps 8000 --batch-size 64 --lr 3e-4 --warmup-steps 200 \
      --resume-from "$TRUNK" --aux-ramp-start 1 --aux-ramp-steps 500 \
      --english-fraction 0.45 --voice-match 0.5 --english-sentences 0.65 \
      --real-fraction 0.2 --real-match 0.5 --channel-aug 0.25 \
      --speed-perturb 0.1 --wire mulaw \
      --device-pool 3072 --pool-refresh-every 150 \
      --select transfer --select-synth-cap 0.08 \
      --eval-every 500 --ckpt-dir "$ENFT2" \
      --metrics-log "$ENFT2/metrics.jsonl" > "$ENFT2/train.log" 2>&1
  log "stage 5 rc=$?"
  read -r W2 C2 <<< "$(metrics_best "$ENFT2/best/eval.json")"
  read -r W1 C1 <<< "$(metrics_best "$TRUNK/eval.json")"
  log "stage 5 gate: en_ft2 (WER $W2, CER $C2) vs trunk (WER $W1, CER $C1)"
  # Promotion needs a real margin (the decoders below were fine-tuned on
  # the OLD encoder; a marginal CER win is not worth risking their
  # cross-attention match).
  if [ -d "$ENFT2/best/asr" ] && python -c "
import sys
w2, c2, c1 = float('$W2'), float('$C2'), float('$C1')
sys.exit(0 if (c2 < c1 - 0.03 and w2 <= 0.08) else 1)" 2>/dev/null; then
    log "stage 5: en_ft2 PROMOTED — re-exporting release trunk weights"
    FINAL=$ENFT2/best
    for part in translator summarizer; do
      [ -d "$TRUNK/$part" ] && cp -r "$TRUNK/$part" "$ENFT2/best/$part"
    done
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tools/make_release.py --ckpt "$ENFT2/best" $XV \
        --out checkpoints/release > /tmp/make_release3e2.log 2>&1
    log "release: $(ls checkpoints/release | tr '\n' ' ')"
    # The copied decoders attend to a moved encoder — verify, and drop the
    # translator from the release if its accuracy collapsed (honest gating;
    # the engine then falls back to translation-off / template summary).
    if [ -d "$ENFT2/best/translator" ]; then
      HEADS_TR2="--translator $ENFT2/best/translator"
      [ -d "$ENFT2/best/summarizer" ] && HEADS_TR2="$HEADS_TR2 --summarizer $ENFT2/best/summarizer"
      timeout 1800 python eval_heads.py --ckpt "$ENFT2/best/asr" $HEADS_TR2 \
          --n 64 > /tmp/heads3e2.log 2>&1
      tail -1 /tmp/heads3e2.log > evals/r3/heads.json
      log "heads (post-continuation): $(cat evals/r3/heads.json)"
      ACC2=$(python - <<'PY'
import json
try:
    d = json.load(open("evals/r3/heads.json"))
    print(d.get("translation_word_acc", d.get("eval", {}).get(
        "translation_word_acc", 0.0)))
except Exception:
    print(0.0)
PY
)
      if ! python -c "exit(0 if float('$ACC2') >= 0.5 else 1)" 2>/dev/null; then
        rm -f checkpoints/release/translator.npz
        log "translator DROPPED from release (post-continuation acc $ACC2)"
      fi
    fi
  else
    log "stage 5: en_ft2 NOT promoted"
  fi
else
  log "stage 5 skipped"
fi

# --- stage 6: diarization operating-point sweep on the FINAL trunk ---------
# The crop-AHC threshold (0.22) was tuned on the d256x4c trunk; the
# English-transfer fine-tune moved the encoder and DER regressed 0.17->0.26.
# Sweep the cut on whatever trunk ships and store the winner in the
# release's config.json decode block (from_json now restores it).
if before_deadline; then
  log "stage 6: diar threshold sweep on $FINAL"
  timeout 3600 python eval_diar.py --ckpt "$FINAL/asr" --n 16 \
      --th "0.14,0.18,0.22,0.26,0.30" > /tmp/diar_sweep3e.log 2>&1
  tail -1 /tmp/diar_sweep3e.log > evals/r3/diar_sweep.json
  log "diar sweep: $(python -c "
import json
d = json.load(open('evals/r3/diar_sweep.json'))
print('best DER', d.get('value'), '@ th', d.get('ahc_threshold'),
      'sweep', [(s['th'], s['der']) for s in d.get('sweep', [])])
" 2>/dev/null)"
  python - <<'PY'
import json, pathlib
sw = json.loads(pathlib.Path("evals/r3/diar_sweep.json").read_text())
best_th, best = sw.get("ahc_threshold"), sw.get("value", 1.0)
base = [s for s in sw.get("sweep", []) if s["th"] == 0.22]
base_der = base[0]["der"] if base else 1.0
cfgp = pathlib.Path("checkpoints/release/config.json")
if best_th is not None and best < base_der:
    cfg = json.loads(cfgp.read_text())
    cfg.setdefault("decode", {})["ahc_threshold"] = best_th
    cfgp.write_text(json.dumps(cfg, indent=1))
    # diar.json should describe the shipped operating point
    pathlib.Path("evals/r3/diar.json").write_text(json.dumps(sw))
    print(f"release decode.ahc_threshold = {best_th} (DER {best} "
          f"vs {base_der} at the old default)")
else:
    print(f"default threshold stands (best {best} @ {best_th}, "
          f"0.22 -> {base_der})")
PY
else
  log "stage 6 skipped (past deadline)"
fi
log "queue done"
