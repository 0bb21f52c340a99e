#!/bin/bash
# Round-5 TPU lane, phase 6: the crash-class scenes with bounded
# dispatches (--burst 24 keeps every dispatch well under the tunnel's
# ~60 s kill; see WATCHDOG_PROBE.txt).
cd /root/repo
set -x
python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
  --budget 2400 --headroom 1200 --grid-K 160 --cap-scale 2 --burst 24 \
  --sync-every 1 --only 12_matOnBoard --out out_r5/BATTERY_tpu_burst_r5.json
echo "TPU16 DONE (matOnBoard burst)"

python tools/paper_battery.py --platform tpu --dtype f32 --steps 205 \
  --budget 6000 --headroom 1800 --grid-K 1500 --cap-scale 4 --burst 24 \
  --only dolphinFunnel --out out_r5/BATTERY_tpu_burst_r5.json --resume
echo "TPU17 DONE (dolphin burst)"

python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
  --budget 2400 --headroom 1500 --burst 24 \
  --only armadillo13K --out out_r5/BATTERY_tpu_burst_r5.json --resume
echo "TPU18 DONE (armadillo13K burst)"

python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
  --budget 2400 --headroom 1500 --grid-K 160 --cap-scale 2 --burst 24 \
  --only mat100x100_twist --out out_r5/BATTERY_tpu_burst_r5.json --resume
echo "TPU19 DONE (mat100x100 burst)"

python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
  --budget 1800 --headroom 1200 --burst 24 \
  --only 2_spherePoints --out out_r5/BATTERY_tpu_burst_r5.json --resume
echo "TPU20 DONE (spherePoints burst)"
