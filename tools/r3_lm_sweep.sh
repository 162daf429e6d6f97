#!/bin/bash
# Lexicon-LM fusion sweep (ops/lexicon.py): grid over (alpha, beta) at a
# fixed beam size, through the product engine on both eval sets (synthetic
# held-out + real held-out gettysburg windows). Fixed beam size keeps one
# compiled graph: alpha/beta are host-side, so only the first run compiles.
#
#   bash tools/r3_lm_sweep.sh checkpoints/r3_d256x4c/best/asr evals/r3
set -u
CKPT=${1:?usage: r3_lm_sweep.sh <asr ckpt dir> [out-dir]}
OUT=${2:-evals/r3}
BEAM=${BEAM:-8}
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}
mkdir -p "$OUT"
SWEEP="$OUT/lm_sweep.jsonl"
: > "$SWEEP"

run_one() {
  local alpha=$1 beta=$2 lex=${3:-synth}
  echo "== beam=$BEAM alpha=$alpha beta=$beta lexicon=$lex"
  timeout 2400 python eval_synth.py --ckpt "$CKPT" --n 64 \
      --beam "$BEAM" --lm-alpha "$alpha" --word-bonus "$beta" \
      --lexicon "$lex" \
      > /tmp/lm_sweep_one.log 2>&1
  local rc=$?
  local line
  line=$(tail -1 /tmp/lm_sweep_one.log)
  echo "{\"beam\": $BEAM, \"lexicon\": \"$lex\", \"alpha\": $alpha, \"beta\": $beta, \"rc\": $rc, \"result\": $line}" >> "$SWEEP"
  echo "rc=$rc $line"
}

# baseline: greedy (the serving default), then acoustic-only beam
echo "== greedy baseline"
timeout 2400 python eval_synth.py --ckpt "$CKPT" --n 64 \
    > /tmp/lm_sweep_one.log 2>&1
echo "{\"beam\": 1, \"alpha\": 0, \"beta\": 0, \"rc\": $?, \"result\": $(tail -1 /tmp/lm_sweep_one.log)}" >> "$SWEEP"
run_one 0.0 0.0
for alpha in 0.3 0.6 1.0; do
  for beta in 0.5 1.5; do
    run_one "$alpha" "$beta"
  done
done
# bigram rows: English word-order context from the sentence bank
for alpha in 0.3 0.6; do
  run_one "$alpha" 0.0 synth_bigram
done
echo "sweep done -> $SWEEP"
