#!/bin/bash
# Round-5 sequential CPU work queue (1 physical core — serialize):
#  1. capacity-FAIL scenes re-run with the f32 EE-classification fix +
#     co-moving frame + big-prim dense sweep (VERDICT #1)
#  2. TPU-crash / TIMEOUT scenes re-recorded on the cpu-jit lane
#     (VERDICT #2: armadillo13K must regain its PASS; #8 hitCardHouse)
#  3. 96K f64 host proxy, per-Newton-iteration mode (VERDICT #4)
#  4. multichip weak-scaling with the ring broad phase (VERDICT #6)
cd /root/repo
set -x
[ -f /tmp/cpu_lane.pid ] && while kill -0 "$(cat /tmp/cpu_lane.pid)" 2>/dev/null; do sleep 20; done

for s in 1_squeezeOut mat100x100_twist armadillo13K 5_hitCardHouse 2_spherePoints 2_matKnives; do
  python tools/paper_battery.py --platform cpu --dtype f32 --jit on \
    --steps 25 --budget 1500 --only "$s" \
    --out out_r5/BATTERY_cpu_r5.json --resume
done
echo "PHASE1 DONE (capacity + crash scenes)"

timeout 7000 python benchmarks/baseline_proxy.py 20 1 sparse max_iters=3 \
  > out_r5/PROXY_96K_raw.json 2> out_r5/proxy96k.err
echo "PHASE2 DONE (96K per-iter proxy) rc=$?"

python benchmarks/multichip_scaling.py --cells 20 --devices 1 8 \
  --out out_r5/MULTICHIP_SCALE_r5.json > out_r5/multichip.log 2>&1
echo "PHASE3 DONE (multichip ring measurement)"

python tools/paper_battery.py --platform cpu --dtype f32 --jit on \
  --steps 10 --budget 3000 --only rodsTwist \
  --out out_r5/BATTERY_cpu_r5.json --resume
echo "PHASE4 DONE (rodsTwist stretch)"
