#!/bin/bash
# Round-4 queued TPU work, in VERDICT-priority order. Each step is
# individually time-bounded and resumable; a wedge mid-queue loses at most
# the step in flight. (Run bench.py FIRST separately — it both scores and
# warms the cache; this queue assumes that already happened or runs it.)
#
# Usage: bash scripts/run_queued_r4.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-artifacts/queued_r4_logs}
mkdir -p "$LOGDIR"
note() { echo "[$(date +%F\ %T)] $*" | tee -a "$LOGDIR/queue.log"; }

note "0/5 liveness: jax.devices() (bounded 15 min)"
if ! timeout 900 python -c "import jax; print(jax.devices())" >> "$LOGDIR/queue.log" 2>&1; then
  note "TUNNEL WEDGED - aborting queue"; exit 1
fi

if [ ! -f artifacts/bench_last_good.json ]; then
  note "0b/5 bench.py cold (no last-good on disk yet)"
  HDMOE_BENCH_TOTAL_S=5400 timeout 5700 python bench.py \
    > "$LOGDIR/bench_cold.json" 2> "$LOGDIR/bench_cold.log"
  note "  exit $? ($LOGDIR/bench_cold.json)"
fi

note "1/5 serving cold-start: artifact path + the warm arms r3 lost"
timeout 9000 python scripts/serve_coldstart_r4.py > "$LOGDIR/coldstart.log" 2>&1
note "  exit $? (artifacts/serve_coldstart_r4.json)"

note "2/5 tg64 flash-bwd regression recheck (dense vs flash-t vs flash-std)"
timeout 7200 python scripts/tg64_bwd_recheck_r4.py > "$LOGDIR/tg64_bwd.log" 2>&1
note "  exit $? (artifacts/tg64_bwd_recheck_r4.json)"

note "3/5 second-checkpoint dial validation (train seed-7 + 3-arm FID@5k)"
timeout 21600 python scripts/dial_second_ckpt_r4.py > "$LOGDIR/dial2.log" 2>&1
note "  exit $? (artifacts/dial_second_ckpt_r4/RESULTS.json)"

note "4/5 bench.py warm rehearsal under the driver-like 900 s window"
# internal deadlines must sit INSIDE the external window so a wedge is
# replayed by bench's own watchdog, not SIGKILLed scoreless (r4 review)
HDMOE_BENCH_DISCOVERY_S=500 HDMOE_BENCH_TOTAL_S=800 \
  timeout 900 python bench.py > "$LOGDIR/bench_warm_rehearsal.json" 2> "$LOGDIR/bench_warm.log"
note "  exit $? ($LOGDIR/bench_warm_rehearsal.json)"

note "queue done"
