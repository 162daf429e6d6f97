#!/bin/bash
# Post-training evaluation battery: run every eval through the product
# engine against a trained checkpoint and collect one JSON report.
#
#   bash tools/run_evals.sh checkpoints/synth_r3/best /tmp/evals_r2
#
# Writes <out>/{synth,heads,diar,long}.json (+ .log). Run on the TPU host;
# each script compiles once (~2-4 min first run, cached after).
set -u
CKPT=${1:?usage: run_evals.sh <ckpt-dir (containing asr/)> [out-dir]}
OUT=${2:-/tmp/omniasr_evals}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "== $name: $*"
  timeout 1800 python "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  # eval scripts print one JSON line last
  tail -1 "$OUT/$name.log" > "$OUT/$name.json"
  echo "rc=$rc  $(cat "$OUT/$name.json")"
}

run synth eval_synth.py --ckpt "$CKPT/asr" --n 96
# Accuracy mode: prefix beam + lexicon-LM shallow fusion (ops/lexicon.py;
# defaults lm_alpha=0.3 from the offline sweep)
run synth_lm eval_synth.py --ckpt "$CKPT/asr" --n 96 --beam 8
HEADS_TR=""
[ -d "$CKPT/translator" ] && HEADS_TR="--translator $CKPT/translator"
[ -d "$CKPT/summarizer" ] && HEADS_TR="$HEADS_TR --summarizer $CKPT/summarizer"
run heads eval_heads.py --ckpt "$CKPT/asr" $HEADS_TR --n 96
run diar  eval_diar.py  --ckpt "$CKPT/asr" --n 16
# Quantized-serving quality deltas vs the bf16 synth numbers above
# (VERDICT r2 #9): int8 dequant, W8A16 and W8A8 Pallas kernel paths.
for Q in int8 w8 a8; do
  run "synth_$Q" eval_synth.py --ckpt "$CKPT/asr" --n 48 --quantize "$Q"
done
# eval_long picks the model up via release discovery (OMNIASR_CHECKPOINT
# env or checkpoints/release); it measures wall/RTF, not quality.
# The 9.5 h run is the reference's max-file-length envelope (SURVEY §6).
run long  eval_long.py  --hours 9.5
# Interactive serving figure (BASELINE.json "RTF at batch=1"): one 30 s
# window alone through the flagship config.
run latency eval_latency.py
echo "reports in $OUT"
