#!/bin/bash
# Round-5 serialized TPU queue: waits for the in-flight staggered dial to
# finish (one TPU job at a time through the tunnel), then runs the rest of
# the round's measurements. Each script is incremental/resumable, so a
# wedged-tunnel kill + rerun continues where it left off.
cd "$(dirname "$0")/.." || exit 1

echo "[queue] waiting for staggered dial (/tmp/stagdial.log rc= marker)"
while ! grep -q "^rc=" /tmp/stagdial.log 2>/dev/null; do sleep 60; done
echo "[queue] dial done: $(grep '^rc=' /tmp/stagdial.log)"

echo "[queue] tg64 bwd recheck ($(date +%H:%M))"
timeout 4000 python scripts/tg64_bwd_recheck_r4.py artifacts/tg64_bwd_recheck_r5.json \
  > /tmp/tg64_r5.log 2>&1
echo "rc=$?" >> /tmp/tg64_r5.log

echo "[queue] train einsum A/B ($(date +%H:%M))"
timeout 7000 python scripts/train_einsum_ab_r5.py > /tmp/train_ab.log 2>&1
echo "rc=$?" >> /tmp/train_ab.log

echo "[queue] fid50k ($(date +%H:%M))"
timeout 9000 python scripts/fid50k_r5.py 50000 > /tmp/fid50k.log 2>&1
echo "rc=$?" >> /tmp/fid50k.log

echo "[queue] all done ($(date +%H:%M))"
