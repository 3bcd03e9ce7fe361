#!/usr/bin/env python
"""Dump the optimized HLO of the bench-point real step with op metadata so
big ops from trace_step.py can be attributed to source lines. Prints every
gather/scatter/custom-call/while/conditional over >1M elements with its
jax scope metadata. Usage:

    python scripts/dump_hlo.py [variant] [out.txt]
"""
from __future__ import annotations

import copy
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from profile_step import BASE, VARIANTS, deep_update  # noqa: E402


def main():
    from morpheus_tpu.utils import setup_compilation_cache
    setup_compilation_cache()
    from morpheus_tpu.config import merge_defaults
    from morpheus_tpu.data import dataset as data_lib
    from morpheus_tpu.data.synthetic import make_synthetic_scene
    from morpheus_tpu.train.trainer import Trainer

    want = sys.argv[1] if len(sys.argv) > 1 else "base"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hlo_step.txt"
    overrides = dict(VARIANTS)[want]
    cfg = merge_defaults(deep_update(copy.deepcopy(BASE), overrides))
    scene = make_synthetic_scene(num_frames=8, H=128, W=128)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    trainer = Trainer(cfg, ds)
    trainer.epoch = 300
    epoch = jnp.asarray(300.0)
    state = trainer.state._replace(global_step=jnp.asarray(33000, jnp.int32))
    step_fn = trainer._make_real_step(trainer._active_levels())

    txt = step_fn.lower(state, jax.random.PRNGKey(0), epoch).compile() \
        .as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")

    # report big ops with metadata
    pat = re.compile(r"(f32|s32|u32|pred|bf16)\[([\d,]+)\]")
    for line in txt.splitlines():
        ls = line.strip()
        m = pat.search(ls)
        if not m:
            continue
        dims = [int(d) for d in m.group(2).split(",") if d]
        n = 1
        for d in dims:
            n *= d
        if n < (1 << 21):
            continue
        if not any(k in ls for k in ("gather", "scatter", "custom-call",
                                     "fusion.22", "while", "conditional",
                                     "sort")):
            continue
        meta = ""
        mm = re.search(r'metadata=\{(.*?)\}', ls)
        if mm:
            meta = mm.group(1)
        print(ls.split(" = ")[0][-60:], "|", m.group(0), "|", meta[:300])


if __name__ == "__main__":
    main()
