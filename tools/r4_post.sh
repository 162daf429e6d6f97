#!/bin/bash
# Post-queue tail work: waits for tools/r4_queue.sh to log "queue done",
# then (TPU now free) runs the instrumented bench, the pretrain ablation
# artifact, and the virtual-mesh scaling sweep.
#
#   setsid nohup bash tools/r4_post.sh > /tmp/r4_post.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/omniasr_jax_cache}

log() { echo "[r4post $(date +%H:%M:%S)] $*"; }

log "waiting for the queue to finish..."
while ! grep -q "queue done" /tmp/r4_queue.log 2>/dev/null; do
  sleep 120
done
log "queue done; starting tail work"

mkdir -p evals/r4

log "ablation artifact"
python tools/ablation_r4.py --out evals/r4/ablation.json \
  > /tmp/r4_ablation.log 2>&1
log "ablation rc=$?"

log "bench (instrumented, sweep)"
timeout 3600 python bench.py > /tmp/r4_bench.json 2>/tmp/r4_bench.log
log "bench rc=$?: $(cat /tmp/r4_bench.json)"
cp /tmp/r4_bench.json evals/r4/bench_selfrun.json 2>/dev/null

log "scaling sweep (virtual CPU mesh)"
timeout 5400 nice -n 10 python tools/scaling_sweep.py --hours 0.15 \
  --out evals/r4/scaling.json > /tmp/r4_scaling.log 2>&1
log "scaling rc=$?"

log "post work done"
