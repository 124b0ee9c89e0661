#!/bin/bash
# Round-5 daytime TPU schedule — chained after r5_night.sh (one dispatcher
# at a time; the shared pool corrupts timings otherwise, STATUS.md):
#   1. wait for the night schedule to exit
#   2. nsweep --resume     — finish the N in {8..1024} grid cells the
#                            night timeout cut (VERDICT #5: no unpublished
#                            cells)
#   3. rerace laplace3d/mc2depi N=512 — the two rows stamp_rooflines
#                            flags "below model"; suite.py's force-race
#                            now races hybrid at a 1.25x model gate so the
#                            actual winning family gets re-measured
#   4. precise re-bank      — any rows the new samples left gate-false
set -u
P=/opt/venv/bin/python
cd /root/repo

if [ -f /tmp/night.pid ]; then
  while ps -p "$(cat /tmp/night.pid)" > /dev/null 2>&1; do sleep 60; done
fi
echo "night schedule done; starting day schedule" >&2

echo "=== nsweep resume ===" >&2
timeout 10800 $P benchmarks/nsweep.py --resume \
  --out benchmarks/results_r5_nsweep.json \
  --matrices nasa4704 pdb1HYS_like webgraph_like shipsec1_like mc2depi_like amazon_like \
  --tuned-configs benchmarks/tuned_configs.json \
  > /tmp/nsweep2_r5.log 2>&1
echo "nsweep2 rc=$?" >&2

echo "=== below-model re-race: laplace3d mc2depi ===" >&2
timeout 7200 $P benchmarks/rerace.py \
  --results benchmarks/results_r5.json \
  --pass-dir benchmarks/passes_r5 \
  --tuned-configs benchmarks/tuned_configs.json \
  --hours 1.8 \
  --rows "laplace3d_64:512;mc2depi_like:512" \
  > /tmp/rerace2_r5.log 2>&1
echo "rerace2 rc=$?" >&2

echo "=== precise re-bank (post-rerace) ===" >&2
timeout 5400 $P benchmarks/precise_verify.py \
  --results benchmarks/results_r5.json \
  > /tmp/bank3_r5.log 2>&1
echo "re-bank2 rc=$?" >&2
echo "=== r5_day done ===" >&2
