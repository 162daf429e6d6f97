#!/bin/bash
# Post-queue tail for the round-4 finale: waits for tools/r5_queue.sh to
# log "queue done" (TPU then free), runs the instrumented bench, and
# commits the self-run artifact alongside the queue's eval battery.
#
#   setsid nohup bash tools/r5_post.sh > /tmp/r5_post.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

log() { echo "[r5post $(date +%H:%M:%S)] $*"; }

log "waiting for the queue to finish..."
while ! grep -q "queue done" /tmp/r5_queue.log 2>/dev/null; do
  sleep 120
done
log "queue done; running the instrumented bench"

mkdir -p evals/r4
timeout 3600 python bench.py > /tmp/r5_bench.json 2>/tmp/r5_bench.log
rc=$?
log "bench rc=$rc: $(cat /tmp/r5_bench.json)"
if [ -s /tmp/r5_bench.json ]; then
  cp /tmp/r5_bench.json evals/r4/bench_selfrun.json
  git add evals/r4/bench_selfrun.json >/dev/null 2>&1 \
    && git commit -q -m "Self-run bench artifact after the r5 queue" \
    && log "bench artifact committed"
fi
log "post work done"
