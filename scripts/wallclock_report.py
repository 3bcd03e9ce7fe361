#!/usr/bin/env python
"""Wall-clock accounting for a (possibly crash-resumed) full-budget run.

Parses the workspace log.txt epoch lines — `[YYYY-MM-DD_HH-MM-SS] epoch
E/N loss=L (S.SSs)` — plus the launch/resume markers, and reports:
  - per-phase stepping time (sum of the trainer's own s/epoch, the pure
    optimization cost, de-duplicated across resumes: a re-trained epoch after
    a crash-resume counts once, at its final occurrence),
  - eval-block time (gaps between epoch lines beyond the stepping cost),
  - setup time per attempt (launch marker -> first epoch line),
  - outage/idle time (everything else between first launch and completion).

Usage: python scripts/wallclock_report.py exp/synthetic_full
"""
from __future__ import annotations

import datetime as dt
import os
import re
import sys

EPOCH_RE = re.compile(
    r"\[(\d{4}-\d{2}-\d{2}_\d{2}-\d{2}-\d{2})\] epoch (\d+)/(\d+) "
    r"loss=\S+ \((\d+\.\d+)s\)")
MARK_RE = re.compile(
    r"\[(\d{4}-\d{2}-\d{2}_\d{2}-\d{2}-\d{2})\] (Loaded|Resumed|Training done)"
    r"(?:.*\(epoch (\d+)\))?")


def parse(ws: str):
    path = os.path.join(ws, "log.txt")
    epochs = {}            # epoch -> (ts, s_per_epoch)  (last occurrence wins)
    marks = []
    order = []
    with open(path) as f:
        for line in f:
            m = EPOCH_RE.match(line)
            if m:
                ts = dt.datetime.strptime(m.group(1), "%Y-%m-%d_%H-%M-%S")
                ep = int(m.group(2))
                epochs[ep] = (ts, float(m.group(4)))
                order.append(("epoch", ts, ep))
                continue
            m = MARK_RE.match(line)
            if m:
                ts = dt.datetime.strptime(m.group(1), "%Y-%m-%d_%H-%M-%S")
                ep = int(m.group(3)) if m.group(3) else None
                order.append((m.group(2), ts, ep))
    return epochs, order


def main():
    ws = sys.argv[1] if len(sys.argv) > 1 else "exp/synthetic_full"
    epochs, order = parse(ws)
    if not order:
        print("no log lines found")
        return
    t0, t1 = order[0][1], order[-1][1]
    total = (t1 - t0).total_seconds()

    # stepping time: the trainer logs with the MEAN s/epoch of the block since
    # the previous line -> block cost = s_per_epoch * (ep - prev_ep of the
    # same attempt; 1 for the first line after a launch/resume). Walk the
    # event stream so resume replays attribute correctly.
    stepping = 0.0
    prev_ep = None
    for kind, _, ep in order:
        if kind == "Loaded":
            prev_ep = 0
        elif kind == "Resumed":
            prev_ep = ep or 0
        elif kind == "epoch":
            blk = 1 if prev_ep is None else max(1, ep - prev_ep)
            stepping += epochs[ep][1] * blk if ep in epochs else 0.0
            prev_ep = ep
    eps = sorted(epochs)
    log_every = min((b - a for a, b in zip(eps, eps[1:])), default=1)

    # setup time: per launch marker, gap to the next event
    setup = 0.0
    for i, (kind, ts, _) in enumerate(order):
        if kind in ("Loaded", "Resumed") and i + 1 < len(order):
            nxt = order[i + 1][1]
            setup += (nxt - ts).total_seconds()

    # duplicated epochs (re-trained after resume) — count the wasted repeats
    seen, dup = set(), 0
    for kind, _, ep in order:
        if kind == "epoch":
            if ep in seen:
                dup += 1
            seen.add(ep)
    wasted = dup * log_every * (stepping / max(len(epochs), 1) / log_every)

    other = total - stepping - setup
    print(f"span        : {t0} -> {t1}  ({total / 3600:.2f} h)")
    print(f"stepping    : {stepping / 3600:.2f} h "
          f"(epoch {max(eps)} reached, "
          f"{dup * log_every} re-trained after resumes ≈ {wasted / 60:.0f} min)")
    print(f"setup       : {setup / 3600:.2f} h (dataset/ckpt/embeddings per attempt)")
    print(f"eval+outage : {other / 3600:.2f} h (video/mesh/metric blocks, "
          f"compiles, tunnel outages — see supervisor.log)")


if __name__ == "__main__":
    main()
