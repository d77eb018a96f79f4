#!/bin/bash
# Round-5 TPU queue, phase 3: after the 50k FID run finishes, refresh the
# bench AOT + last-good on the frozen source tree (freeze discipline,
# VERDICT item 8), then spend any remaining window on the einsum-training
# quality check.
cd "$(dirname "$0")/.." || exit 1

echo "[queue] waiting for fid50k (/tmp/fid50k.log rc= marker)"
while ! grep -q "^rc=" /tmp/fid50k.log 2>/dev/null; do sleep 60; done
echo "[queue] fid50k done: $(grep '^rc=' /tmp/fid50k.log)"

echo "[queue] bench refresh ($(date +%H:%M))"
timeout 2500 python bench.py > /tmp/bench_r5.log 2>&1
echo "rc=$?" >> /tmp/bench_r5.log

echo "[queue] einsum-training quality check ($(date +%H:%M))"
timeout 4500 python scripts/train_einsum_quality_r5.py > /tmp/einsum_quality.log 2>&1
echo "rc=$?" >> /tmp/einsum_quality.log

echo "[queue] phase 3 done ($(date +%H:%M))"
