#!/bin/bash
# One-shot TPU measurement suite: gather-mode microbench, step-level
# ablations, and the driver bench protocol. Results land in /tmp/tpu_results.
set -u
OUT=/tmp/tpu_results
mkdir -p $OUT
cd "$(dirname "$0")/.."

echo "== gather microbench ==" | tee $OUT/status
timeout 1200 python scripts/bench_gather.py rows hist_rows mxu_rows mxu_rows_bf16 \
    > $OUT/gather.txt 2>&1
echo "gather done rc=$?" | tee -a $OUT/status

echo "== step variants ==" | tee -a $OUT/status
timeout 2400 python scripts/profile_step.py base hist mxu late_hist late_mxu occ_off \
    > $OUT/profile.txt 2>&1
echo "profile done rc=$?" | tee -a $OUT/status

echo "== device trace (mxu variant) ==" | tee -a $OUT/status
timeout 1200 python scripts/trace_step.py mxu > $OUT/trace_mxu.txt 2>&1
echo "trace done rc=$?" | tee -a $OUT/status

echo "== device trace (hist default) ==" | tee -a $OUT/status
timeout 1200 python scripts/trace_step.py hist > $OUT/trace_hist.txt 2>&1
echo "trace hist done rc=$?" | tee -a $OUT/status

echo "== bench.py (shipped defaults) ==" | tee -a $OUT/status
timeout 1800 python bench.py > $OUT/bench.json 2> $OUT/bench.err
echo "bench done rc=$?" | tee -a $OUT/status
