#!/bin/bash
# Round-5 TPU lane, phase 3 (waits for phase 2):
#  - dolphinFunnel RE-RUN with the intersection-filter fix: the earlier
#    205-step record simulated a frozen dolphin (phantom intersection
#    blocked the scripted drag); this run must show real motion
#    (sysE/M/L trends, nonzero velocity)
#  - armadillo13K on the chip (cpu lane TIMEOUTed under contention)
#  - rodsTwist attempt, solo on the tunnel (r4 compile was SIGKILLed
#    while sharing it)
cd /root/repo
set -x
[ -f /tmp/tpu_runner2.pid ] && while kill -0 "$(cat /tmp/tpu_runner2.pid)" 2>/dev/null; do sleep 30; done

python tools/paper_battery.py --platform tpu --dtype f32 --steps 205 \
  --budget 8000 --headroom 1500 --sync-every 5 --grid-K 1500 --cap-scale 4 \
  --only dolphinFunnel --out out_r5/BATTERY_tpu_fix_r5.json
echo "TPU10 DONE (dolphin refixed)"

python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
  --budget 3000 --headroom 1500 --sync-every 5 \
  --only armadillo13K --out out_r5/BATTERY_tpu_fix_r5.json --resume
echo "TPU11 DONE (armadillo13K)"

python tools/paper_battery.py --platform tpu --dtype f32 --steps 10 \
  --budget 4000 --headroom 2400 --sync-every 5 \
  --only rodsTwist --out out_r5/BATTERY_tpu_fix_r5.json --resume
echo "TPU12 DONE (rodsTwist)"
