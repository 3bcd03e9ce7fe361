#!/bin/bash
# Round-5 post-run chip pipeline: waits for the full-budget supervisor
# (/tmp/fullrun.pid) to finish, then executes the measurement suite and the
# quality A/B in sequence. Everything lands in measurements/r5/ (tracked) and
# is git-committed after every stage, so a tunnel outage or the round
# boundary mid-pipeline loses nothing that already ran — the round-4 failure
# mode was all results queueing behind one serial chip and none landing.
#
# Ordering: wallclock (cheap) -> bench (the headline) -> quality A/B (the
# recon-quality + semantics-delta evidence, VERDICT r4 #5/#6 — placed EARLY
# because it is the longest stage and the round boundary may cut the tail)
# -> SDS ablations -> rooflines -> step ablations -> dense-scale. Detached
# eval workers (flagship final epoch + A/B arms) grind on the CPU in
# parallel with chip stages; the final stage waits for them and re-copies
# the metric trail.
set -u
OUT=measurements/r5
cd "$(dirname "$0")/.."
mkdir -p $OUT
WS=exp/synthetic_full

copy_metrics() {
  cp "$WS/metric_3d.txt" $OUT/ 2>/dev/null
  find "$WS/depths" -name 'depthL1_score_mean*.txt' -exec cp {} $OUT/ \; \
      2>/dev/null
  for arm in ab_exact ab_shipped; do
    cp "exp/$arm/metric_3d.txt" "$OUT/metric_3d_$arm.txt" 2>/dev/null
    find "exp/$arm/depths" -name 'depthL1_score_mean_*.txt' \
        -exec cp {} "$OUT/depthL1_$arm.txt" \; 2>/dev/null
  done
}

commit_results() {
  # every stage commit also sweeps the latest metric rows: detached eval
  # workers land rows asynchronously, and the round boundary must capture
  # whatever exists at the last pre-boundary commit
  copy_metrics
  git add -A measurements/r5 2>/dev/null
  git -c user.name=distsys-graft -c user.email=graft@localhost \
      commit -q -m "measurements/r5: $1" 2>/dev/null || true
}

echo "$(date -u +%FT%TZ) waiting for full-budget run" | tee $OUT/status
while kill -0 "$(cat /tmp/fullrun.pid 2>/dev/null)" 2>/dev/null; do
  sleep 120
done
COMPLETE=0
grep -q "run COMPLETE" "$WS/supervisor.log" && COMPLETE=1
echo "$(date -u +%FT%TZ) supervisor exited (complete=$COMPLETE);" \
     "starting measurements" | tee -a $OUT/status

python scripts/wallclock_report.py $WS > $OUT/wallclock.txt 2>&1
tail -40 "$WS/log.txt" > $OUT/run_tail.txt 2>/dev/null
commit_results "flagship run wallclock + metric trail (complete=$COMPLETE)"

# A/B before bench: the driver runs its own bench.py at round end either
# way (BENCH_r05), while the A/B quality table exists ONLY if these arms
# finish before the boundary (200 epochs each — round-2 measured the
# Acc/Comp plateau by ep 200 on this scene)
echo "== quality A/B + recon arm (exact vs shipped, 200 epochs each) ==" \
    | tee -a $OUT/status
timeout 18000 bash scripts/run_ab.sh > $OUT/ab.txt 2>&1
echo "ab rc=$?" | tee -a $OUT/status
commit_results "quality A/B arms trained (exact vs shipped)"

echo "== bench.py (driver protocol, all SDS variants incl. s05) ==" \
    | tee -a $OUT/status
MORPHEUS_BENCH_NO_PAUSE=1 BENCH_SDS=all BENCH_BUDGET_S=3600 \
    timeout 4500 python bench.py > $OUT/bench.json 2> $OUT/bench.err
echo "bench rc=$?" | tee -a $OUT/status
commit_results "bench (incl. sds_step_ms_s05)"

echo "== SDS virtual-step ablations (post-800 regime, VERDICT r4 #4) ==" \
    | tee -a $OUT/status
timeout 5400 python scripts/profile_sds.py > $OUT/profile_sds.txt 2>&1
echo "profile_sds rc=$?" | tee -a $OUT/status
commit_results "SDS step ablation splits"

echo "== roofline splits (achieved GB/s, late + base) ==" | tee -a $OUT/status
timeout 2400 python scripts/profile_step.py --roofline 1900 \
    > $OUT/roofline_1900.txt 2>&1
echo "roofline_1900 rc=$?" | tee -a $OUT/status
timeout 2400 python scripts/profile_step.py --roofline 300 \
    > $OUT/roofline_300.txt 2>&1
echo "roofline_300 rc=$?" | tee -a $OUT/status
commit_results "rooflines"

echo "== step ablations (incl. late bf16-MLP) ==" | tee -a $OUT/status
timeout 3600 python scripts/profile_step.py \
    base occ_off no_band no_perturb no_smooth render_only bf16_mlp \
    late late_bf16_mlp no_merge no_code no_orient \
    > $OUT/profile.txt 2>&1
echo "profile rc=$?" | tee -a $OUT/status
commit_results "step ablations"

echo "== dense-scale microbench ==" | tee -a $OUT/status
timeout 1800 python scripts/bench_dense_scale.py > $OUT/dense_scale.txt 2>&1
echo "dense_scale rc=$?" | tee -a $OUT/status
commit_results "dense-scale microbench"

# detached eval workers (flagship ep-2000 + A/B arms, 1-vCPU ICP) can
# outlive every chip stage — wait, then re-copy the complete metric trail
for ws in "$WS" exp/ab_exact exp/ab_shipped; do
  python - "$ws" <<'EOF'
import sys
from morpheus_tpu.eval.backfill import wait_for_evals
wait_for_evals(sys.argv[1], timeout_s=7200)
EOF
done
copy_metrics
echo "$(date -u +%FT%TZ) ALL DONE" | tee -a $OUT/status
commit_results "status final + late metric rows"
