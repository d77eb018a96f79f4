#!/bin/bash
# Round-5 TPU queue, phase 2: after dial v2 (dpm-staggered arms) finishes,
# run the tg64 backward recheck, the train dispatch A/B, and the 50k FID
# (including the dpm-staggered winner).
cd "$(dirname "$0")/.." || exit 1

echo "[queue] waiting for dial v2 (/tmp/stagdial2.log rc= marker)"
while ! grep -q "^rc=" /tmp/stagdial2.log 2>/dev/null; do sleep 60; done
echo "[queue] dial v2 done: $(grep '^rc=' /tmp/stagdial2.log)"

echo "[queue] tg64 bwd recheck ($(date +%H:%M))"
timeout 4000 python scripts/tg64_bwd_recheck_r4.py artifacts/tg64_bwd_recheck_r5.json \
  > /tmp/tg64_r5.log 2>&1
echo "rc=$?" >> /tmp/tg64_r5.log

echo "[queue] train einsum A/B ($(date +%H:%M))"
timeout 7000 python scripts/train_einsum_ab_r5.py > /tmp/train_ab.log 2>&1
echo "rc=$?" >> /tmp/train_ab.log

echo "[queue] fid50k ($(date +%H:%M))"
FID50K_DPM_STAG=1 timeout 10000 python scripts/fid50k_r5.py 50000 > /tmp/fid50k.log 2>&1
echo "rc=$?" >> /tmp/fid50k.log

echo "[queue] all done ($(date +%H:%M))"
