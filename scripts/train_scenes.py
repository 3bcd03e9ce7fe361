#!/usr/bin/env python
"""Multi-scene fan-out: per-scene optimization is embarrassingly parallel, so
multi-host scale-out over DCN is N independent trainer processes, one scene
per host/chip (SURVEY §5 'distributed communication backend' — the TPU-native
equivalent of a launcher; within a host, rays shard over ICI via
parallel/sharding.py).

    python scripts/train_scenes.py configs/snoopy.yaml configs/duck.yaml ...
    python scripts/train_scenes.py --parallel 2 configs/*.yaml
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("configs", nargs="+")
    parser.add_argument("--parallel", type=int, default=1,
                        help="concurrent trainer processes (one per device)")
    parser.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                        help="extra CLI args forwarded to morpheus.py")
    args = parser.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pending = list(args.configs)
    running: list[subprocess.Popen] = []
    failures = 0
    while pending or running:
        while pending and len(running) < args.parallel:
            cfg = pending.pop(0)
            print(f"[launch] {cfg}", flush=True)
            running.append(subprocess.Popen(
                [sys.executable, os.path.join(root, "morpheus.py"),
                 "--config", cfg] + args.extra))
        done = [p for p in running if p.poll() is not None]
        for p in done:
            running.remove(p)
            if p.returncode != 0:
                failures += 1
                print(f"[fail] exit {p.returncode}", flush=True)
        if running:
            running[0].wait()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
