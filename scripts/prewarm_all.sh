#!/bin/bash
# Sequentially prewarm the persistent compile cache for bench.py variants
# (scripts/prewarm_bench_cache.py): one process per variant so each loaded
# executable is released from the device before the next compile; nice'd so
# the concurrent full-budget trainer keeps host-CPU priority for its
# sampler/logging. Default order puts the SDS variants first — they are the
# multi-minute compiles that have historically blown bench's budget.
set -u
cd "$(dirname "$0")/.."
VARIANTS=${@:-"sds_s05 sds_s02 sds_bf16_s02 chained300 real300 late1900"}
for v in $VARIANTS; do
  echo "=== $v $(date -u +%FT%TZ)"
  nice -n 15 python scripts/prewarm_bench_cache.py "$v" \
    || echo "$v FAILED rc=$?"
done
echo "=== done $(date -u +%FT%TZ)"
