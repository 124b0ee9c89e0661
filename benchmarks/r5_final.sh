#!/bin/bash
# Round-5 final quiet-window schedule — chained after r5_day.sh (one
# dispatcher at a time on the shared pool, STATUS.md):
#   1. wait for the day schedule to exit
#   2. precise re-bank    — per-row ISOLATED children (a device OOM no
#                           longer poisons the remaining rows)
#   3. nsweep --redo      — re-race the mc2depi N=64 contended-window
#                           outlier (79 GF between 169 and 158 neighbors)
#   4. ELL serve probe    — measured TPU cold-serve evidence for the
#                           round-5 ELL serving path
set -u
P=/opt/venv/bin/python
cd /root/repo

if [ -f /tmp/day.pid ]; then
  while ps -p "$(cat /tmp/day.pid)" > /dev/null 2>&1; do sleep 60; done
fi
echo "day schedule done; starting final schedule" >&2

echo "=== precise re-bank (isolated) ===" >&2
timeout 7200 $P benchmarks/precise_verify.py \
  --results benchmarks/results_r5.json \
  > /tmp/bank4_r5.log 2>&1
echo "bank4 rc=$?" >&2

echo "=== nsweep redo: mc2depi_like:64 ===" >&2
timeout 3600 $P benchmarks/nsweep.py --resume --redo mc2depi_like:64 \
  --out benchmarks/results_r5_nsweep.json \
  --matrices mc2depi_like \
  --tuned-configs benchmarks/tuned_configs.json \
  > /tmp/nsweep3_r5.log 2>&1
echo "nsweep3 rc=$?" >&2

echo "=== ELL serve probe ===" >&2
timeout 1800 $P benchmarks/scratch/serve_probe.py ell \
  > /tmp/serve_ell_r5.log 2>&1
echo "serve_ell rc=$?" >&2
echo "=== r5_final done ===" >&2
