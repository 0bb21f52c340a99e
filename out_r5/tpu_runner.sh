#!/bin/bash
# Round-5 TPU lane (ONE job at a time — concurrent tunnel clients crash
# the worker; that was round 4's "TPU worker crashed" class):
#  1. dolphinFunnel >=200 steps with conservation columns (VERDICT #5)
#  2. 12_matOnBoard on the production TPU lane with the EE-classification
#     fix + capacity warm start (VERDICT #1)
#  3. mat100x100_twist solo on the chip (VERDICT #1/#2 — the round-4
#     record was a crash while a probe shared the tunnel)
#  4. 2_spherePoints / 2_matKnives (TIMEOUT-class scenes, TPU is ~10x)
#  5. 96K scaling artifact for bench.py (SCALING_96K.json)
cd /root/repo
set -x
python tools/paper_battery.py --platform tpu --dtype f32 --steps 205 \
  --budget 8000 --headroom 1500 --only dolphinFunnel \
  --out out_r5/BATTERY_tpu_r5.json
echo "TPU1 DONE (dolphin)"

python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
  --budget 2400 --headroom 1200 --grid-K 160 --cap-scale 2 \
  --only 12_matOnBoard --out out_r5/BATTERY_tpu_r5.json --resume
echo "TPU2 DONE (matOnBoard)"

python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
  --budget 3600 --headroom 1800 --grid-K 160 --cap-scale 2 \
  --only mat100x100_twist --out out_r5/BATTERY_tpu_r5.json --resume
echo "TPU3 DONE (mat100x100)"

python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
  --budget 2400 --headroom 1200 --only 2_spherePoints \
  --out out_r5/BATTERY_tpu_r5.json --resume
echo "TPU4 DONE (spherePoints)"

python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
  --budget 2400 --headroom 1200 --only 2_matKnives \
  --out out_r5/BATTERY_tpu_r5.json --resume
echo "TPU5 DONE (matKnives)"

python benchmarks/scaling.py --sizes 20 --steps 25 --settle 15 \
  > out_r5/SCALING_96K.jsonl 2> out_r5/scaling96k.err
echo "TPU6 DONE (96K scaling) rc=$?"
# refresh the bench per-iter artifact at the repo root
python - <<'PYEOF'
import json
rec = json.loads(open('out_r5/SCALING_96K.jsonl').read().strip().splitlines()[-1])
open('SCALING_96K.json', 'w').write(json.dumps(rec))
print('SCALING_96K.json refreshed:', rec.get('sec_per_newton_iter'))
PYEOF
echo "TPU7 DONE (bench artifact)"
