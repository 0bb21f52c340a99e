#!/bin/bash
# Round-4 CPU battery lane: the 8 never-attempted scenes first (VERDICT #2),
# then the full sweep. Scenes covered by the TPU lane are excluded.
cd /root/repo
for s in 1_squeezeOut 2_spherePoints 8_rollerBall 15_trashComp \
         17_pinCushionBall 18_pointRollerBall 18_segRollerBall; do
  python tools/paper_battery.py --route cpujit --steps 15 --budget 600 \
    --only "$s" --out out_r4/BATTERY_cpu_r4.json --resume
done
python tools/paper_battery.py --route cpujit --steps 15 --budget 600 \
  --skip dolphinFunnel,mat40x40,matOnBoard,matKnives,mat100x100,rodsTwist,armadillo13K \
  --out out_r4/BATTERY_cpu_r4.json --resume
echo "CPU LANE DONE" >> out_r4/cpu_lane.log
