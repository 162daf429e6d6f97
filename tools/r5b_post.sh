#!/bin/bash
# Hardened self-run bench (VERDICT r4 weak #6): the round-4 artifact
# recorded an rc-failure JSON because the bench ran exactly once into a
# hostile pool. This version (a) waits for the r5b queue to release the
# TPU, (b) probes before every attempt, (c) retries the bench itself, and
# (d) only commits an artifact whose JSON parses with value > 0 — a dead
# pool leaves the previous good artifact in place instead of clobbering it.
#
#   setsid nohup bash tools/r5b_post.sh > /tmp/r5b_post.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}
OUT=${1:-evals/r5/bench_selfrun.json}
DEADLINE=${R5B_POST_DEADLINE:-$(( $(date +%s) + 14400 ))}

log() { echo "[r5bpost $(date +%H:%M:%S)] $*"; }

log "waiting for the r5b queue to finish..."
while ! grep -q "r5b queue done" /tmp/r5b.log 2>/dev/null; do
  [ "$(date +%s)" -lt "$DEADLINE" ] || { log "deadline before queue end"; break; }
  sleep 120
done

probe() {
  timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print(float((x @ x).sum()))
" > /dev/null 2>&1
}

good() {  # <file> -> 0 when the artifact is a real measurement
  python - "$1" <<'PY'
import json, sys
try:
    d = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
    ok = d.get("value", 0) and not d.get("error")
except Exception:
    ok = False
raise SystemExit(0 if ok else 1)
PY
}

mkdir -p "$(dirname "$OUT")"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if ! probe; then
    log "TPU unclaimable; retry in 3 min"
    sleep 180
    continue
  fi
  log "bench attempt"
  timeout 3600 python bench.py > /tmp/r5b_bench.json 2>/tmp/r5b_bench.log
  rc=$?
  log "bench rc=$rc: $(tail -c 400 /tmp/r5b_bench.json)"
  if [ "$rc" = "0" ] && good /tmp/r5b_bench.json; then
    cp /tmp/r5b_bench.json "$OUT"
    git add "$OUT" >/dev/null 2>&1 \
      && git commit -q -m "Self-run bench artifact (r5b tail)" \
      && log "bench artifact committed"
    break
  fi
  log "attempt not usable; retry in 5 min"
  sleep 300
done
# Translation artifact from whatever stage-T run exists (CPU-only).
if [ -s checkpoints/r5_translator/metrics.jsonl ]; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/translation_artifact.py \
      --metrics checkpoints/r5_translator/metrics.jsonl \
      --out evals/r5/translation.json && \
  git add evals/r5/translation.json >/dev/null 2>&1 \
    && git commit -q -m "Translation eval artifact (template-held-out split)" \
    && log "translation artifact committed"
fi
log "post work done"
