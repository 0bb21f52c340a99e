#!/bin/bash
# Round-5 TPU lane, phase 2 (waits for tpu_runner.sh to release the chip):
#  - 1_squeezeOut: cpu-jit lane cannot finish a step in any budget; the
#    chip + capacity warm start + block syncs give it a real chance
#  - dolphinFunnel deep refresh is in phase 1; here: profile refresh at 96K
cd /root/repo
set -x
[ -f /tmp/tpu_runner.pid ] && while kill -0 "$(cat /tmp/tpu_runner.pid)" 2>/dev/null; do sleep 30; done

python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
  --budget 4000 --headroom 1800 --grid-K 128 --cap-scale 4 --sync-every 5 \
  --only 1_squeezeOut --out out_r5/BATTERY_tpu_r5.json --resume
echo "TPU8 DONE (squeezeOut)"

timeout 3600 python benchmarks/profile_components.py 20 10 \
  > out_r5/PROFILE_96K_r5.txt 2>&1
echo "TPU9 DONE (96K profile) rc=$?"
