#!/bin/bash
# Round-4 post-run chip pipeline: waits for the full-budget supervisor
# (/tmp/fullrun.pid) to finish, then executes the measurement suite and the
# quality A/B in sequence. Everything lands in measurements/r4/ — a TRACKED
# path, so the driver's end-of-round auto-commit captures results even if
# the pipeline outlives the builder's turns (exp/ is gitignored).
# Ordering: cheap/high-value first (wallclock -> bench incl. the s05 SDS
# point -> roofline late/base -> ablations -> A/B) so a tunnel outage or the
# round boundary mid-pipeline loses the least. The A/B (2x 400-epoch runs,
# hours) runs only after a COMPLETE flagship run; the measurements run even
# when the supervisor gave up (circuit breaker) — a free chip is a free chip.
set -u
OUT=measurements/r4
cd "$(dirname "$0")/.."
mkdir -p $OUT
WS=exp/synthetic_full

echo "$(date -u +%FT%TZ) waiting for full-budget run" | tee $OUT/status
while kill -0 "$(cat /tmp/fullrun.pid 2>/dev/null)" 2>/dev/null; do
  sleep 120
done
COMPLETE=0
grep -q "run COMPLETE" "$WS/supervisor.log" && COMPLETE=1
echo "$(date -u +%FT%TZ) supervisor exited (complete=$COMPLETE);" \
     "starting measurements" | tee -a $OUT/status

python scripts/wallclock_report.py $WS > $OUT/wallclock.txt 2>&1
cp "$WS/metric_3d.txt" $OUT/ 2>/dev/null
find "$WS" -name 'depthL1_score_mean.txt' -exec cp {} $OUT/ \; 2>/dev/null
tail -40 "$WS/log.txt" > $OUT/run_tail.txt 2>/dev/null

echo "== bench.py (driver protocol, all SDS variants incl. s05) ==" \
    | tee -a $OUT/status
MORPHEUS_BENCH_NO_PAUSE=1 BENCH_SDS=all BENCH_BUDGET_S=3600 \
    timeout 4200 python bench.py > $OUT/bench.json 2> $OUT/bench.err
echo "bench rc=$?" | tee -a $OUT/status

echo "== roofline splits (achieved GB/s, late + base) ==" | tee -a $OUT/status
timeout 2400 python scripts/profile_step.py --roofline 1900 \
    > $OUT/roofline_1900.txt 2>&1
echo "roofline_1900 rc=$?" | tee -a $OUT/status
timeout 2400 python scripts/profile_step.py --roofline 300 \
    > $OUT/roofline_300.txt 2>&1
echo "roofline_300 rc=$?" | tee -a $OUT/status

echo "== SDS virtual-step ablations (the post-800 regime, ~70% of budget) ==" \
    | tee -a $OUT/status
timeout 5400 python scripts/profile_sds.py > $OUT/profile_sds.txt 2>&1
echo "profile_sds rc=$?" | tee -a $OUT/status

echo "== dense-scale microbench (oct-packing extension decision data) ==" \
    | tee -a $OUT/status
timeout 1800 python scripts/bench_dense_scale.py > $OUT/dense_scale.txt 2>&1
echo "dense_scale rc=$?" | tee -a $OUT/status

echo "== step ablations (incl. late bf16-MLP, VERDICT r3 #5) ==" \
    | tee -a $OUT/status
timeout 3600 python scripts/profile_step.py \
    base occ_off no_band no_perturb no_smooth render_only bf16_mlp \
    late late_bf16_mlp no_merge no_code no_orient \
    > $OUT/profile.txt 2>&1
echo "profile rc=$?" | tee -a $OUT/status

if [ "$COMPLETE" -eq 1 ]; then
  echo "== quality A/B (exact vs shipped semantics, 400 epochs each) ==" \
      | tee -a $OUT/status
  timeout 18000 bash scripts/run_ab.sh > $OUT/ab.txt 2>&1
  echo "ab rc=$?" | tee -a $OUT/status
else
  echo "run incomplete — A/B deferred (fix the run first)" | tee -a $OUT/status
fi
echo "$(date -u +%FT%TZ) ALL DONE" | tee -a $OUT/status
