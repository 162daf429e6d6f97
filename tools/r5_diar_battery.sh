#!/bin/bash
# Round-5 diarization battery (VERDICT r4 item 4): the 4-way
# {count-mode} x {resegment} grid the round-4 queue never produced
# artifacts for. Runs the SHIPPED release (engine + xvector) on the CPU
# backend at nice 19 so it can proceed while the TPU trains the flagship.
#
#   setsid nohup bash tools/r5_diar_battery.sh > /tmp/r5_diar.log 2>&1 &
set -u
cd /root/repo
OUT=${1:-evals/r5}
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "== $name: $* ($(date +%H:%M:%S))"
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    nice -n 19 timeout 5400 python eval_diar.py --n 16 "$@" \
    > "$OUT/$name.log" 2>&1
  rc=$?
  tail -1 "$OUT/$name.log" > "$OUT/$name.json"
  echo "rc=$rc  $(cat "$OUT/$name.json")"
}

run diar
run diar_eigengap --count-mode eigengap
run diar_reseg --resegment
run diar_eigengap_reseg --count-mode eigengap --resegment

python - <<'PY'
import json, pathlib
out = pathlib.Path("evals/r5")
rows = {}
for p in out.glob("diar*.json"):
    try:
        rows[p.stem] = json.loads(p.read_text())
    except Exception:
        pass
for k, v in sorted(rows.items()):
    print(k, "DER", v.get("value"), "count_acc", v.get("speaker_count_acc"))
PY
echo "diar battery done"
