#!/bin/bash
# Round-5 TPU lane, phase 4: worker-crash bisection (waits for phase 3).
#  a) mat40x40_twist control: passed r4 pre-fix; if it crashes now the
#     crash is in this round's changes, else it's scene-dependent
#  b) matOnBoard with the Pallas Hv kernel disabled: isolates the one
#     custom kernel from the "kernel fault" message
cd /root/repo
set -x
[ -f /tmp/tpu_runner3.pid ] && while kill -0 "$(cat /tmp/tpu_runner3.pid)" 2>/dev/null; do sleep 30; done

python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
  --budget 2400 --headroom 1200 --sync-every 5 \
  --only mat40x40_twist --out out_r5/BATTERY_tpu_fix_r5.json --resume
echo "TPU13 DONE (mat40 control)"

IPC_NO_PALLAS=1 python tools/paper_battery.py --platform tpu --dtype f32 \
  --steps 25 --budget 2400 --headroom 1200 --sync-every 5 --grid-K 160 \
  --cap-scale 2 --only 12_matOnBoard --out out_r5/BATTERY_tpu_nopallas.json
echo "TPU14 DONE (matOnBoard no-pallas)"
