#!/bin/bash
# Round-5 sequential TPU schedule (one dispatcher at a time — the shared
# pool corrupts timings if anything else dispatches, STATUS.md):
#   1. serve_probe      — the "one bitstream" cold-vs-warm measurement
#   2. rerace           — ELL challengers + scattered-class + N=16 floors
#                         (VERDICT r4 #2/#3/#10), merging into results_r5
#   3. nsweep           — publish the N in {8..1024} grid (VERDICT #5)
#   4. precise_verify   — re-bank gates on rows the rerace re-decided or
#                         transient compile failures skipped (VERDICT #1)
set -u
P=/opt/venv/bin/python
cd /root/repo

echo "=== serve probe ===" >&2
timeout 1800 $P benchmarks/scratch/serve_probe.py > /tmp/serve_probe.log 2>&1
echo "serve probe rc=$?" >&2

echo "=== rerace ===" >&2
timeout 19800 $P benchmarks/rerace.py \
  --results benchmarks/results_r5.json \
  --pass-dir benchmarks/passes_r5 \
  --tuned-configs benchmarks/tuned_configs.json \
  --hours 5.0 \
  --rows "amazon_like:16,128,512;webgraph_like:16,128,512;cop20k_like:16,128,512;mac_econ_like:512;webbase1M_like:16,128,512;roadnet_like:16,512;scircuit_like:16,512;mc2depi_like:512;laplace3d_64:512;nlpkkt80_like:512" \
  > /tmp/rerace_r5.log 2>&1
echo "rerace rc=$?" >&2

echo "=== nsweep ===" >&2
timeout 9000 $P benchmarks/nsweep.py \
  --out benchmarks/results_r5_nsweep.json \
  --matrices nasa4704 pdb1HYS_like webgraph_like shipsec1_like mc2depi_like amazon_like \
  --tuned-configs benchmarks/tuned_configs.json \
  --deadline-ts $(($(date +%s) + 29000)) \
  > /tmp/nsweep_r5.log 2>&1
echo "nsweep rc=$?" >&2

echo "=== precise re-bank ===" >&2
timeout 7200 $P benchmarks/precise_verify.py \
  --results benchmarks/results_r5.json \
  > /tmp/bank2_r5.log 2>&1
echo "re-bank rc=$?" >&2
echo "=== r5_night done ===" >&2
