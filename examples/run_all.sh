#!/bin/bash
# The script-pipeline analogue of the reference's notebook regression
# harness (/root/reference/examples/notebooks/run.sh executes every paper
# notebook in place; results-diffing the committed outputs was its de-facto
# regression check — SURVEY.md section 4).
#
#   QUICK=1 bash examples/run_all.sh   # CPU-forced smoke of every pipeline
#   bash examples/run_all.sh           # full TPU pipelines, serialized
#
# TPU discipline: ONE device process at a time (the axon tunnel grants the
# chip exclusively); never timeout-kill a TPU process.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PWD/examples:/root/.axon_site"

fail=0
run() {
  echo "=== $* — $(date)"
  if [ "${QUICK:-0}" = "1" ]; then
    python -u examples/_cpu_runner.py "$@" || { echo "FAILED: $*"; fail=1; }
  else
    python -u "$@" || { echo "FAILED: $*"; fail=1; }
  fi
}

if [ "${QUICK:-0}" = "1" ]; then
  run examples/sample.py
  run examples/tuning.py
  run examples/scgem.py --quick
  run examples/imputation_comparison.py
  run examples/atlas_scale.py --sparse-data --cells 2000 --epochs 30 \
      --epoch-pd 100
else
  run examples/sample.py
  run examples/tuning.py
  run examples/scgem.py
  run examples/scmnc_motor.py
  run examples/scmnc_visual.py
  run examples/scglue.py           # skips itself if the mount lacks data
  run examples/comparison.py
  run examples/imputation_comparison.py
  run examples/time_and_memory.py
  run examples/atlas_scale.py --sparse-data --cells 100000
fi
echo "=== run_all done (fail=$fail) — $(date)"
exit $fail
