#!/bin/bash
# Round-4 TPU retry lane (runs after tpu_perf.sh frees the chip):
#  - 12_matOnBoard / 1_squeezeOut: capacity FAILs fixed by the big-prim
#    dense sweep + co-moving-frame broad phase
#  - mat100x100_twist / 2_matKnives: "TPU worker crashed" records caused
#    by a debug probe sharing the chip with the lane child
#  - 2_spherePoints: cpu-f32 TIMEOUT at 3 steps; the TPU lane is ~10x
# Records land in BATTERY_tpu_retry_r4.json — listed LAST in the STATUS
# merge, so these supersede the stale FAIL/TIMEOUT rows.
cd /root/repo
set -x
for s in 12_matOnBoard 1_squeezeOut mat100x100_twist 2_matKnives 2_spherePoints; do
  python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
    --budget 3600 --only "$s" --out out_r4/BATTERY_tpu_retry_r4.json --resume
done
echo "TPU RETRY DONE"
