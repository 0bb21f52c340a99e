#!/bin/bash
# Round-5 CPU queue, phase 2: instrumented 96K f64 proxy (waits for the
# first CPU runner to finish multichip + rodsTwist so the measurement
# gets the core to itself).
cd /root/repo
set -x
[ -f /tmp/cpu_runner.pid ] && while kill -0 "$(cat /tmp/cpu_runner.pid)" 2>/dev/null; do sleep 30; done
timeout 6000 python benchmarks/baseline_proxy.py 20 1 sparse max_iters=3 \
  > out_r5/PROXY_96K_raw.json 2> out_r5/proxy96k.err
echo "CPU-P2 DONE rc=$?"
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
echo "CPU-P3 DONE (proxy artifact)"
