#!/usr/bin/env python
"""Capture a device trace of the bench-point real step and print the top ops
by total device time (jax.profiler + ProfileData). Usage:

    python scripts/trace_step.py [variant]
"""
from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from profile_step import BASE, VARIANTS, deep_update  # noqa: E402
import copy


def main():
    from morpheus_tpu.utils import setup_compilation_cache
    setup_compilation_cache()
    from morpheus_tpu.config import merge_defaults
    from morpheus_tpu.data import dataset as data_lib
    from morpheus_tpu.data.synthetic import make_synthetic_scene
    from morpheus_tpu.train.trainer import Trainer

    want = sys.argv[1] if len(sys.argv) > 1 else "base"
    overrides = dict(VARIANTS)[want]
    cfg = merge_defaults(deep_update(copy.deepcopy(BASE), overrides))
    scene = make_synthetic_scene(num_frames=8, H=128, W=128)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    trainer = Trainer(cfg, ds)
    trainer.epoch = 300
    epoch = jnp.asarray(300.0)
    state = trainer.state._replace(global_step=jnp.asarray(33000, jnp.int32))
    step_fn = trainer._make_real_step(trainer._active_levels())

    key = jax.random.PRNGKey(0)
    for _ in range(6):
        key, k = jax.random.split(key)
        state, loss = step_fn(state, k, epoch)
    float(loss)

    tdir = "/tmp/trace_step"
    with jax.profiler.trace(tdir):
        for _ in range(4):
            key, k = jax.random.split(key)
            state, loss = step_fn(state, k, epoch)
        float(loss)

    # find the trace file and aggregate device-plane op durations
    import glob
    paths = sorted(glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    pd = jax.profiler.ProfileData.from_file(paths[-1])
    agg = collections.Counter()
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                name = ev.name
                # strip fusion numbering for grouping
                base = name.split(".")[0].rstrip("0123456789_")
                agg[base] += dur
                total += dur
    print(f"# plane total {total:.1f} ms over 4 steps "
          f"({total / 4:.1f} ms/step)")
    for name, ms in agg.most_common(40):
        print(f"{ms / 4:8.3f} ms/step  {name}")

    # top individual events with full names (shapes identify the op)
    events = []
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            if "Ops" not in line.name:
                continue
            for ev in line.events:
                events.append((ev.duration_ns / 1e6, ev.name))
    events.sort(reverse=True)
    print("\n# top individual events")
    for dur, name in events[:50]:
        print(f"{dur:8.3f} ms  {name[:200]}")


if __name__ == "__main__":
    main()
