#!/bin/bash
# Sequentially prewarm the persistent compile cache for bench.py /
# profile_step.py variants (scripts/prewarm_bench_cache.py): one process per
# variant so each loaded executable is released from the device before the
# next compile; nice'd so the concurrent full-budget trainer keeps host-CPU
# priority for its sampler/logging. Default order puts the SDS variants
# first — they are the multi-minute compiles that have historically blown
# bench's budget.
#
# Per-variant timeout + one retry pass: trainer construction device_puts a
# few MB, so a tunnel outage can leave a variant blocked on an RPC that
# never completes (observed: futex wait forever). timeout bounds the loss;
# the retry pass picks the variant up once the chip answers again.
# Variants starting with "profile:" run scripts/profile_step.py
# --compile-only <name> instead.
set -u
cd "$(dirname "$0")/.."
# sds_bf16_s05_late leads: it is the flagship run's actual post-800
# operating point and bench.py times it unconditionally (ADVICE r4 #1)
VARIANTS=${@:-"sds_bf16_s05_late sds_s05 sds_bf16_s05 sds_s02 sds_bf16_s02 chained300 real300 late1900"}
TIMEOUT_S=${TIMEOUT_S:-2700}

wait_chip() {
  # don't start a variant into a dead tunnel: trainer construction
  # device_puts a few MB and blocks forever on a dead RPC (the per-variant
  # timeout would then burn 45 min per variant for nothing)
  # 180 s: a fresh client's first op queues behind the trainer's chained
  # dispatches (~23 s each, back-to-back) plus ~60 s of import/connect on a
  # loaded host — 90 s false-negatived against a healthy busy chip
  until timeout 180 python -c \
      "import jax, jax.numpy as jnp; \
assert float(jnp.arange(8.0).sum()) == 28.0" >/dev/null 2>&1; do
    echo "chip down/unresponsive $(date -u +%FT%TZ), waiting"
    sleep 90
  done
}

run_variant() {
  case "$1" in
    profile:*)
      timeout "$TIMEOUT_S" nice -n 15 \
        python scripts/profile_step.py --compile-only "${1#profile:}" ;;
    *)
      timeout "$TIMEOUT_S" nice -n 15 \
        python scripts/prewarm_bench_cache.py "$1" ;;
  esac
}

FAILED=""
for v in $VARIANTS; do
  wait_chip
  echo "=== $v $(date -u +%FT%TZ)"
  run_variant "$v" || { echo "$v FAILED rc=$?"; FAILED="$FAILED $v"; }
done
for v in $FAILED; do
  wait_chip
  echo "=== retry $v $(date -u +%FT%TZ)"
  run_variant "$v" || echo "$v FAILED AGAIN rc=$?"
done
echo "=== done $(date -u +%FT%TZ)"
