#!/bin/bash
# Round-5 TPU lane, phase 7: crash localization (waits for phase 6).
# burst=4 keeps every dispatch ~5 s; the exception message now names the
# dispatch (begin / burst#N / finish) that killed the worker.
cd /root/repo
set -x
[ -f /tmp/tpu_runner6.pid ] && while kill -0 "$(cat /tmp/tpu_runner6.pid)" 2>/dev/null; do sleep 30; done
python tools/paper_battery.py --platform tpu --dtype f32 --steps 10 \
  --budget 2400 --headroom 1200 --grid-K 160 --cap-scale 2 --burst 4 \
  --only 12_matOnBoard --out out_r5/BATTERY_tpu_burst4.json
echo "TPU21 DONE (matOnBoard burst4)"
