#!/usr/bin/env python
"""Ablation profiler for the Zero123 SDS virtual step — the operating regime
that owns ~70% of the reference budget's wall-clock (novel_view_scale 0.5
after epoch 800 → 32,400 rendered rays/virtual step, snoopy.yaml:5-6).

bench.py reports single totals per operating point; this splits the step's
cost across its knobs so the next optimization round is attribution-driven:

  s05            f32 UNet, epoch-300 curriculum (bench anchor)
  s05_noremat    remat_virtual off — price of the exact-rematerialized
                 render backward (HBM-for-FLOPs trade, trainer.py
                 virtual_loss_from_batch)
  s05_bf16       bf16 UNet (the fp16-autocast analogue the full run ships)
  s05_bf16_late  + all 16 hash levels (the run's true post-800 point)
  s05_bf16_late_noremat  the above without remat (fits in isolation; the
                 full run needs remat only for total residency)
  s02            5,184-ray anchor (pre-epoch-800 point)

Each variant materializes full-size random guidance (~3.4 GB f32 / 1.7 GB
bf16) — do NOT run while the full-budget trainer owns the chip; the post-run
pipeline (round4_after_run.sh) is the intended caller.

Usage: python scripts/profile_sds.py [variant ...]
"""
from __future__ import annotations

import copy
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import BENCH_POINT_CFG

VARIANTS = {
    "s05": dict(scale=0.5),
    "s05_noremat": dict(scale=0.5, remat=False),
    "s05_bf16": dict(scale=0.5, bf16=True),
    "s05_bf16_late": dict(scale=0.5, bf16=True, ep=1900),
    "s05_bf16_late_noremat": dict(scale=0.5, bf16=True, ep=1900, remat=False),
    "s02": dict(scale=0.2),
    # field-MLP bf16 on top of the run's true post-800 point: the virtual
    # RENDER (not the UNet) owns the SDS step per round-4's in-loop split,
    # and tpu.mlp_dtype is its biggest untested lever (VERDICT r3 #5/r4 #4)
    "s05_bf16_late_mlpbf16": dict(scale=0.5, bf16=True, ep=1900,
                                  mlp_bf16=True),
    "s05_bf16_late_mlpbf16_noremat": dict(scale=0.5, bf16=True, ep=1900,
                                          mlp_bf16=True, remat=False),
}


def time_sds_variant(name, scale=0.5, bf16=False, ep=300, remat=True,
                     mlp_bf16=False):
    from morpheus_tpu.config import merge_defaults
    from morpheus_tpu.data import dataset as data_lib
    from morpheus_tpu.data.synthetic import make_synthetic_scene
    from morpheus_tpu.guidance import zero123 as z123
    from morpheus_tpu.train.trainer import Trainer

    cfg = merge_defaults(copy.deepcopy(BENCH_POINT_CFG))
    cfg["tpu"]["remat_virtual"] = remat
    if mlp_bf16:
        cfg["tpu"]["mlp_dtype"] = "bfloat16"
    gspec = z123.Zero123Spec()
    if bf16:
        gspec = dataclasses.replace(gspec, compute_dtype="bfloat16")
    scene = make_synthetic_scene(num_frames=8, H=360, W=360)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    g = z123.cast_for_compute(
        z123.Zero123Guidance.init_random(jax.random.PRNGKey(1), gspec), gspec)
    trainer = Trainer(cfg, ds, guidance=g, guidance_spec=gspec)
    # rebind to the trainer's CLIP-less guidance tree (the ViT-L tower is
    # only needed for the one-time embedding precompute) — keeping the full
    # `g` alive pins ~0.6-1.2 GB of dead tower in HBM, which OOM'd the
    # late-level variants here while the identical operating point runs fine
    # in the real trainer (morpheus.py does the same rebind)
    g = trainer.guidance
    trainer.epoch = ep
    vstep = trainer._virtual_step_for_scale(scale, trainer._active_levels())
    st = trainer.state._replace(global_step=jnp.asarray(33001, jnp.int32))
    ep_arr = jnp.asarray(float(ep))
    key = jax.random.PRNGKey(2)
    t_c = time.perf_counter()
    for _ in range(3):
        key, k = jax.random.split(key)
        st, vloss, _ = vstep(st, g, trainer._embeddings, k, ep_arr)
    float(vloss)
    compile_s = time.perf_counter() - t_c
    nv = 8
    t0 = time.perf_counter()
    for _ in range(nv):
        key, k = jax.random.split(key)
        st, vloss, _ = vstep(st, g, trainer._embeddings, k, ep_arr)
    float(vloss)
    dt = (time.perf_counter() - t0) / nv
    rays = int(360 * scale) ** 2
    print(f"{name:24s} {dt * 1e3:8.1f} ms/step  {rays / dt:9.0f} rays/s  "
          f"(compile {compile_s:.0f}s, loss {float(vloss):.4f})", flush=True)
    return dt


def main():
    names = sys.argv[1:] or list(VARIANTS)
    if len(names) > 1:
        # ONE PROCESS PER VARIANT: a single process accumulates HBM across
        # variants (each materializes ~2-3.4 GB guidance + loaded
        # executables), and the later/larger variants then OOM spuriously —
        # observed 2026-08-20: s05_bf16_late RESOURCE_EXHAUSTED after three
        # in-process variants, fine in isolation.
        import subprocess
        for n in names:
            subprocess.run([sys.executable, os.path.abspath(__file__), n])
        return
    from morpheus_tpu.utils import setup_compilation_cache
    setup_compilation_cache()
    for n in names:
        if n not in VARIANTS:
            print(f"unknown variant {n}; have {list(VARIANTS)}")
            continue
        try:
            time_sds_variant(n, **VARIANTS[n])
        except Exception as e:  # OOM on one variant must not kill the rest
            print(f"{n:24s} FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
