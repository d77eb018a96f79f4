#!/bin/bash
# Session-proof TPU recovery watcher (round 3, tunnel-outage playbook).
#
# The axon tunnel can wedge server-side for 6+ hours (CLAUDE.md gotchas).
# This loop probes liveness every ~10 min with a bounded jax.devices()
# matmul; the moment a probe succeeds it hands off to run_queued_r3.sh,
# which runs every queued TPU revalidation in value order (each step
# individually time-bounded + resumable). Launch with setsid+nohup so it
# survives the driver session that started it:
#
#   setsid nohup bash scripts/tpu_watch_and_queue.sh \
#     > artifacts/queued_r3_logs/watch.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOGDIR=artifacts/queued_r3_logs
mkdir -p "$LOGDIR"
STAMP="$LOGDIR/queue_started.stamp"

if [ -e "$STAMP" ]; then
  echo "[watch] queue already started ($(cat "$STAMP")); exiting"
  exit 0
fi

n=0
while true; do
  n=$((n + 1))
  echo "[watch] probe $n at $(date +%T)"
  if timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print('tpu ok:', float((x @ x).sum()))
" >> "$LOGDIR/watch_probe.log" 2>&1; then
    echo "[watch] TUNNEL ALIVE at $(date +%T) - launching queue"
    date > "$STAMP"
    bash scripts/run_queued_r3.sh "$LOGDIR"
    echo "[watch] queue finished at $(date +%T)"
    exit 0
  fi
  echo "[watch] probe $n timed out/failed; sleeping 600s"
  sleep 600
done
