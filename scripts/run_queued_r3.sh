#!/bin/bash
# Round-3 queued TPU revalidations (PERF.md "Tunnel outage note").
#
# One TPU window runs everything that was scripted-and-queued when the axon
# tunnel wedged, in value order; every step is individually time-bounded and
# resumable (fid50k caches real-side stats + partial gen moments to disk),
# so a second wedge mid-queue loses at most the step in flight.
#
# Usage: bash scripts/run_queued_r3.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-artifacts/queued_r3_logs}
mkdir -p "$LOGDIR"
note() { echo "[$(date +%F\ %T)] $*" | tee -a "$LOGDIR/queue.log"; }

note "0/4 liveness: jax.devices() (bounded 15 min)"
if ! timeout 900 python -c "import jax; print(jax.devices())" >> "$LOGDIR/queue.log" 2>&1; then
  note "TUNNEL STILL WEDGED - aborting queue"; exit 1
fi

note "0b/6 bench.py (headline img/s; insurance in case the driver's end-of-round window hits another wedge)"
timeout 3600 python bench.py > artifacts/bench_r3_manual.json 2> "$LOGDIR/bench_manual.log"
note "  exit $? (artifacts/bench_r3_manual.json)"

note "1/6 perf_round3 barrier-corrected revalidation (control/pallas/priority)"
PERF_ONLY=A_control_cf1,D_pallas_conv,E_priority \
  timeout 7200 python scripts/perf_round3.py artifacts/perf_round3_reval.json \
  > "$LOGDIR/perf_reval.log" 2>&1
note "  exit $? (artifacts/perf_round3_reval.json)"

note "1a/6 scan-unroll IDLE chase (bit-identical pipelining A/B)"
timeout 5400 python scripts/idle_unroll_r3.py > "$LOGDIR/idle_unroll.log" 2>&1
note "  exit $? (artifacts/idle_unroll_r3.json)"

note "1b/6 deploy-path validation (flagship artifact export/load/identity)"
timeout 5400 python scripts/deploy_r3.py > "$LOGDIR/deploy.log" 2>&1
note "  exit $? (artifacts/deploy_r3.json)"

note "2/6 fid50k priority dials (dense row already recorded; resumable)"
timeout 21600 python scripts/fid50k_r3.py > "$LOGDIR/fid50k.log" 2>&1
note "  exit $? (artifacts/fid50k_r3.json)"

note "3/6 fast10k capstone (10k-step fast loop + matched EMA + post-hoc sweep)"
timeout 21600 python scripts/longrun_r3_fast10k.py > "$LOGDIR/fast10k.log" 2>&1
note "  exit $? (artifacts/longrun_r3_fast10k/RESULTS.json)"

note "4/6 augmentation A/B (reference TODO 3.1 search evidence)"
timeout 14400 python scripts/augment_ab_r3.py > "$LOGDIR/augment_ab.log" 2>&1
note "  exit $? (artifacts/augment_ab_r3/RESULTS.json)"

note "5/6 DPM-Solver++(2M) solver dial (FID@5k + throughput vs Heun)"
timeout 14400 python scripts/dpm_eval_r3.py > "$LOGDIR/dpm_eval.log" 2>&1
note "  exit $? (artifacts/dpm_eval_r3.json)"

note "6/7 bucketed-serving tail latency (batch 1/4/16 engines)"
timeout 7200 python scripts/serve_latency_r3.py > "$LOGDIR/serve_latency.log" 2>&1
note "  exit $? (artifacts/serve_latency_r3.json)"

# 6: matched-decay classic-EMA rerun of the 2,800-step run: superseded by
# fast10k's ema_decay=0.9995 + post-hoc sweep (same question, better run);
# kept here for a manual window with time to spare:
#   timeout 14400 python scripts/longrun_r3_ema.py 2800 5000 0.999
note "queue done"
