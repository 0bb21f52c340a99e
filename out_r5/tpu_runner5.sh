#!/bin/bash
# Round-5 TPU lane, phase 5: watchdog probe (waits for phase 4).
cd /root/repo
set -x
[ -f /tmp/tpu_runner4.pid ] && while kill -0 "$(cat /tmp/tpu_runner4.pid)" 2>/dev/null; do sleep 30; done
timeout 1800 python tools/tpu_watchdog_probe.py 5 30 60 120 300 \
  > out_r5/WATCHDOG_PROBE.txt 2>&1
echo "TPU15 DONE (watchdog probe) rc=$?"
