#!/bin/bash
# Round-5 CPU queue, phase 4: dolphin retry with realistic capacities
# (the K=1500 copy-paste from the TPU sizing made the query tile sort
# 12000 wide — zero steps in the whole budget).
cd /root/repo
set -x
[ -f /tmp/cpu_runner3.pid ] && while kill -0 "$(cat /tmp/cpu_runner3.pid)" 2>/dev/null; do sleep 30; done
python tools/paper_battery.py --platform cpu --dtype f32 --jit on \
  --steps 25 --budget 3600 --headroom 1200 --grid-K 256 --cap-scale 2 \
  --sync-every 5 --only dolphinFunnel \
  --out out_r5/BATTERY_cpu_dolphin2.json
echo "CPU-P5 DONE (dolphin cpu retry)"
