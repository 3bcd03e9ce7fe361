#!/bin/bash
# Supervised full-reference-budget run (2000 epochs / 220k steps,
# configs/synthetic_full.yaml). The axon TPU tunnel drops for hours at a
# time; exp.ckpt: latest + exp.ckpt_interval give resume-exact restarts, so
# this wrapper just relaunches on crash until the run completes, waiting for
# the chip to answer before each (re)launch. Cumulative on-chip wall-clock
# (excluding outage gaps) is tracked in $WS/wallclock.txt for RESULTS.md.
set -u
CFG=${1:-configs/synthetic_full.yaml}
WS=${2:-exp/synthetic_full}
cd "$(dirname "$0")/.."
mkdir -p "$WS"
LOG="$WS/supervisor.log"

while true; do
  # wait until the tunnel answers
  until timeout 60 python -c \
      "import jax; assert jax.devices()[0].platform=='tpu'" >/dev/null 2>&1; do
    echo "$(date -u +%FT%TZ) tpu down, waiting" >> "$LOG"
    sleep 120
  done
  echo "$(date -u +%FT%TZ) launching trainer" >> "$LOG"
  T0=$(date +%s)
  python morpheus.py --config "$CFG" >> "$LOG" 2>&1
  RC=$?
  T1=$(date +%s)
  echo "attempt $(date -u +%FT%TZ) rc=$RC secs=$((T1 - T0))" >> "$WS/wallclock.txt"
  if [ $RC -eq 0 ]; then
    echo "$(date -u +%FT%TZ) run COMPLETE" >> "$LOG"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) trainer died rc=$RC — will resume" >> "$LOG"
  sleep 30
done
