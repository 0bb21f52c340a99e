#!/bin/bash
# Round-4 sequential CPU work queue (1 physical core — serialize):
#  1. the 8 never-attempted paper scenes (VERDICT #2)
#  2. multichip weak-scaling evidence with the sharded broad phase (#5)
#  3. 96K-tet f64 host proxy, the target-scale denominator (#7)
#  4. full battery sweep, resumable (#2/#6)
cd /root/repo
set -x
for s in 1_squeezeOut 2_spherePoints 8_rollerBall 15_trashComp \
         17_pinCushionBall 18_pointRollerBall 18_segRollerBall; do
  python tools/paper_battery.py --route cpujit --steps 15 --budget 600 \
    --only "$s" --out out_r4/BATTERY_cpu_r4.json --resume
done
echo "PHASE1 DONE (8 unattempted)"

python benchmarks/multichip_scaling.py --cells 20 --devices 1 8 \
  --out out_r4/MULTICHIP_SCALE_r4.json
echo "PHASE2 DONE (multichip)"

timeout 7200 python benchmarks/baseline_proxy.py 20 2 sparse \
  > out_r4/PROXY_96K.json.txt 2> out_r4/proxy96k.err
echo "PHASE3 DONE (96K proxy) rc=$?"

python tools/paper_battery.py --route cpujit --steps 15 --budget 600 \
  --skip dolphinFunnel,mat40x40,matOnBoard,matKnives,mat100x100,rodsTwist,armadillo13K \
  --out out_r4/BATTERY_cpu_r4.json --resume
echo "CPU RUNNER DONE"
