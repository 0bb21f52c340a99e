#!/bin/bash
# Round-4 TPU battery lane: the scenes VERDICT r3 names (#1 mat100x100,
# #3 scripted scenes on the jit path, #4 flagship depth, #10 rodsTwist),
# run sequentially on the one real v5e. Incremental/atomic --out writes +
# --resume make this lane survive session restarts.
cd /root/repo
for s in mat40x40_twist 12_matOnBoard mat100x100_twist 2_matKnives \
         armadillo13K_twist 4_rodsTwist; do
  python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
    --budget 5400 --only "$s" --out out_r4/BATTERY_tpu_r4.json --resume
done
echo "TPU LANE DONE" >> out_r4/tpu_lane.log
