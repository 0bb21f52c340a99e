#!/bin/bash
# Round-5 CPU queue, phase 3 (waits for the first CPU runner):
#  1. dolphinFunnel on the cpu-jit lane — the UNFROZEN flagship scene
#     (the TPU lane is blocked by the tunnel's 60 s dispatch kill +
#     transport instability); real motion evidence with conservation
#  2. instrumented 96K f64 proxy (solo core for a clean measurement)
cd /root/repo
set -x
[ -f /tmp/cpu_runner.pid ] && while kill -0 "$(cat /tmp/cpu_runner.pid)" 2>/dev/null; do sleep 30; done

python tools/paper_battery.py --platform cpu --dtype f32 --jit on \
  --steps 40 --budget 2000 --headroom 900 --grid-K 1500 --cap-scale 4 \
  --sync-every 5 --only dolphinFunnel \
  --out out_r5/BATTERY_cpu_dolphin.json
echo "CPU-P2 DONE (dolphin cpu-jit)"

timeout 5400 python benchmarks/baseline_proxy.py 20 1 sparse max_iters=3 \
  > out_r5/PROXY_96K_raw.json 2> out_r5/proxy96k.err
echo "CPU-P3 DONE (96K proxy) rc=$?"
python - <<'PYEOF'
import json
rec = None
for line in open('out_r5/PROXY_96K_raw.json'):
    try:
        d = json.loads(line)
    except Exception:
        continue
    if 'sec_per_newton_iter' in d:
        rec = d
if rec:
    json.dump(rec, open('PROXY_96K.json', 'w'))
    print('PROXY_96K.json written:', rec['sec_per_newton_iter'])
else:
    print('no final record; partial calls only')
PYEOF
echo "CPU-P4 DONE (proxy artifact)"
