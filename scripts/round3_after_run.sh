#!/bin/bash
# Round-3 post-run chip pipeline: waits for the full-budget supervisor
# (/tmp/fullrun.pid) to finish, then — only on a COMPLETE run — executes the
# measurement suite and the quality A/B in sequence. Everything lands in
# /tmp/tpu_results_r3 for the PARITY.md roofline + RESULTS.md writeups.
set -u
OUT=/tmp/tpu_results_r3
mkdir -p $OUT
cd "$(dirname "$0")/.."
WS=exp/synthetic_full

echo "$(date -u +%FT%TZ) waiting for full-budget run" | tee $OUT/status
while kill -0 "$(cat /tmp/fullrun.pid 2>/dev/null)" 2>/dev/null; do
  sleep 120
done
if ! grep -q "run COMPLETE" "$WS/supervisor.log"; then
  echo "$(date -u +%FT%TZ) supervisor exited WITHOUT completion — stopping" \
    | tee -a $OUT/status
  exit 1
fi
echo "$(date -u +%FT%TZ) run complete; starting measurements" | tee -a $OUT/status

python scripts/wallclock_report.py $WS > $OUT/wallclock.txt 2>&1
cp "$WS/metric_3d.txt" $OUT/ 2>/dev/null
find "$WS" -name 'depthL1_score_mean.txt' -exec cp {} $OUT/ \; 2>/dev/null

echo "== step ablations ==" | tee -a $OUT/status
timeout 3600 python scripts/profile_step.py \
    base occ_off no_band no_perturb no_smooth render_only bf16_mlp \
    late late_bf16_mlp no_merge no_code no_orient \
    > $OUT/profile.txt 2>&1
echo "profile rc=$?" | tee -a $OUT/status

echo "== dense-scale microbench ==" | tee -a $OUT/status
timeout 1200 python scripts/bench_dense_scale.py > $OUT/dense_scale.txt 2>&1
echo "dense_scale rc=$?" | tee -a $OUT/status

echo "== bench.py (driver protocol, all SDS variants) ==" | tee -a $OUT/status
BENCH_SDS=all BENCH_BUDGET_S=2400 timeout 3000 python bench.py \
    > $OUT/bench.json 2> $OUT/bench.err
echo "bench rc=$?" | tee -a $OUT/status

echo "== quality A/B (exact vs shipped semantics) ==" | tee -a $OUT/status
timeout 14400 bash scripts/run_ab.sh > $OUT/ab.txt 2>&1
echo "ab rc=$?" | tee -a $OUT/status
echo "$(date -u +%FT%TZ) ALL DONE" | tee -a $OUT/status
