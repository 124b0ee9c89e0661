#!/bin/bash
# Quiet-window runbook (run ONLY after the overnight driver has exited and
# no other process can dispatch to the TPU — check `ps aux | grep suite`).
# Each step is independently skippable; stop at any point and re-run later.
#
#   bash benchmarks/tail_window.sh [hours_for_reraces]
set -x
cd "$(dirname "$0")/.."
export TMPDIR=/root/cache
export SEXTANS_PACK_CACHE_DIR=/root/cache/sextans_pack_cache
RERACE_HOURS="${1:-1.0}"

# 1. calibrate the gather cost model (writes nothing; read the numbers and
#    update ELL_GATHER_FACTOR / ELL_MIN_FETCH by hand, then run the
#    autotune tests)
timeout 1800 python benchmarks/scratch/gather_probe.py |& tee /tmp/gather_probe.log

# 2. table-wide reverse store challenge with the recalibrated model
timeout $(printf '%.0f' "$(echo "$RERACE_HOURS * 3700" | bc)") \
  python benchmarks/rerace.py --ratio 1.5 --hours "$RERACE_HOURS" \
  --also-merge benchmarks/results_r2.json |& tee /tmp/rerace.log

# 3. canonical N-sweep (best effort until its deadline)
timeout 3600 python benchmarks/nsweep.py \
  --out benchmarks/results_r3_nsweep.json \
  --tuned-configs benchmarks/tuned_configs.json \
  --deadline-ts "$(python -c 'import time; print(time.time()+3300)')" \
  |& tee /tmp/nsweep.log

# 4. regenerate the README table from the canonical file
python benchmarks/report.py benchmarks/results_r3.json > /tmp/readme_table.md
echo "README table in /tmp/readme_table.md — splice into README.md"

# 5. bench.py sanity (the driver runs this at round end too)
timeout 1200 python bench.py
