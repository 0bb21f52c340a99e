#!/bin/bash
# Round-5 TPU lane, phase 8 (final): the two remaining headline scenes
# under the confirmed bounded-dispatch mitigation (burst=4).
cd /root/repo
set -x
[ -f /tmp/tpu_runner7.pid ] && while kill -0 "$(cat /tmp/tpu_runner7.pid)" 2>/dev/null; do sleep 20; done
python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
  --budget 1500 --headroom 1500 --grid-K 1500 --cap-scale 4 --burst 4 \
  --only dolphinFunnel --out out_r5/BATTERY_tpu_burst4.json --resume
echo "TPU22 DONE (dolphin burst4)"
python tools/paper_battery.py --platform tpu --dtype f32 --steps 15 \
  --budget 1200 --headroom 1200 --grid-K 160 --cap-scale 2 --burst 4 \
  --only mat100x100_twist --out out_r5/BATTERY_tpu_burst4.json --resume
echo "TPU23 DONE (mat100 burst4)"
