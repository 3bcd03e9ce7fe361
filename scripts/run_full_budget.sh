#!/bin/bash
# Supervised full-reference-budget run (2000 epochs / 220k steps,
# configs/synthetic_full.yaml). The axon TPU tunnel drops for hours at a
# time; exp.ckpt: latest + exp.ckpt_interval give resume-exact restarts, so
# this wrapper relaunches on crash until the run completes, waiting for the
# chip to answer before each (re)launch. Cumulative on-chip wall-clock
# (excluding outage gaps) is tracked in $WS/wallclock.txt for RESULTS.md.
#
# Stall watchdog (round-3 addition): a dropped tunnel can leave the trainer
# BLOCKED on an RPC forever instead of crashing (observed: futex wait, 0 CPU,
# no log/file activity). Every 60 s the watchdog compares the trainer's
# cumulative CPU time and the newest file mtime under $WS; if BOTH are idle
# past STALL_S (default 900) the trainer is killed and the outer loop resumes
# it from the last exp.ckpt_interval checkpoint. CPU-busy silent phases (the
# final ICP/metric stage) and file-writing phases (video/mesh exports) are
# never killed.
set -u
CFG=${1:-configs/synthetic_full.yaml}
WS=${2:-exp/synthetic_full}
STALL_S=${STALL_S:-900}
cd "$(dirname "$0")/.."
mkdir -p "$WS"
LOG="$WS/supervisor.log"

cpu_jiffies() {  # utime+stime of pid $1 (0 if gone)
  awk '{print $14 + $15}' "/proc/$1/stat" 2>/dev/null || echo 0
}

newest_mtime() {  # newest file mtime under $WS except the supervisor's own
  find "$WS" -type f ! -name 'supervisor.log' ! -name 'wallclock.txt' \
       -printf '%T@\n' 2>/dev/null | sort -rn | head -1 | cut -d. -f1
}

while true; do
  # wait until the tunnel answers AND the chip executes real work — after a
  # tunnel drop the plugin can still enumerate the device while every
  # computation blocks forever (observed 2026-08-19: jax.devices() fine,
  # first device op hangs in futex wait), so probe with an actual reduction
  until timeout 120 python -c "import jax, jax.numpy as jnp; \
assert jax.devices()[0].platform=='tpu'; \
assert float(jnp.arange(8.0).sum()) == 28.0" >/dev/null 2>&1; do
    echo "$(date -u +%FT%TZ) tpu down/unresponsive, waiting" >> "$LOG"
    sleep 120
  done
  echo "$(date -u +%FT%TZ) launching trainer" >> "$LOG"
  T0=$(date +%s)
  python morpheus.py --config "$CFG" >> "$LOG" 2>&1 &
  PID=$!
  LAST_CPU=0
  IDLE_SINCE=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    NOW=$(date +%s)
    CPU=$(cpu_jiffies "$PID")
    MT=$(newest_mtime); MT=${MT:-0}
    # progress = CPU burned (>=1 s/min) or a file written since last check
    if [ $((CPU - LAST_CPU)) -ge 100 ] || [ "$MT" -gt "$IDLE_SINCE" ]; then
      IDLE_SINCE=$NOW
    fi
    LAST_CPU=$CPU
    if [ $((NOW - IDLE_SINCE)) -gt "$STALL_S" ]; then
      echo "$(date -u +%FT%TZ) stall: no cpu/file progress for" \
           "$((NOW - IDLE_SINCE))s — killing trainer (pid $PID)" >> "$LOG"
      kill "$PID" 2>/dev/null
      sleep 15
      kill -9 "$PID" 2>/dev/null
    fi
  done
  wait "$PID"
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
