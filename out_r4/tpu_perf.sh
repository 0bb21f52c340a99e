#!/bin/bash
# Round-4 TPU perf evidence (VERDICT #7/#8), run after the battery lane
# frees the chip:
#  1. 96K-tet impact-phase measurement -> SCALING_96K.json (+ r4 name)
#  2. component/phase breakdown at 96K -> PROFILE_96K_r4.txt
#  3. dolphinFunnel conservation-log refresh (sig-digit sysE/M/L)
cd /root/repo
set -x
python benchmarks/scaling.py --sizes 20 --steps 25 --settle 15 \
  > out_r4/SCALING_96K.jsonl 2> out_r4/scaling96k.err
echo "PERF1 DONE rc=$?"

timeout 3600 python benchmarks/profile_components.py 20 10 \
  > out_r4/PROFILE_96K_r4.txt 2>&1
echo "PERF2 DONE rc=$?"

python tools/paper_battery.py --platform tpu --dtype f32 --steps 25 \
  --budget 3600 --only dolphinFunnel --out out_r4/BATTERY_tpu_refresh.json
echo "TPU PERF DONE"
