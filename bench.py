"""Benchmark: rays/sec/chip during real-view optimization (the BASELINE.md
north-star metric). Prints ONE JSON line.

Runs the full jitted train step (occupancy marching, field eval with normals,
all losses, grads, Adam) on a synthetic scene at reference-scale settings:
2048 rays/step (morpheus.py:826), 128³ occupancy grid, 16-level hash grid,
step_size 0.01. vs_baseline is rays/sec against a 30k rays/sec reference-GPU
estimate (220k steps × ~2.2k rays in ~4.5h on A100 — the reference publishes no
number, BASELINE.json "published": {}).
"""
from __future__ import annotations

import json
import time

import jax
import numpy as np

BASELINE_RAYS_PER_SEC = 30000.0


def main():
    from morpheus_tpu.utils import setup_compilation_cache
    setup_compilation_cache()

    from morpheus_tpu.config import merge_defaults
    from morpheus_tpu.data import dataset as data_lib
    from morpheus_tpu.data.synthetic import make_synthetic_scene
    from morpheus_tpu.train.trainer import Trainer

    cfg = merge_defaults({
        "data": {"data_dir": "<synthetic>"},
        "exp": {"seed": 0},
        "train": {"real_ray_num": 2048, "real_freq": 1, "n_iters": 1},
        "model": {"bg_radius": 0.0},
        "render": {"step_size": 0.01},
        "tpu": {"max_samples_per_ray": 64, "march_steps": 256,
                "occ_resolution": 128, "occ_warmup_steps": 256,
                "occ_update_every": 16},
    })
    scene = make_synthetic_scene(num_frames=8, H=128, W=128)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    trainer = Trainer(cfg, ds)

    step_fn = trainer._make_real_step()
    epoch = jax.numpy.asarray(300.0)  # post-warmup lr/curriculum regime

    # compile + occupancy warmup. NOTE: block_until_ready does not actually
    # block on the axon TPU platform — force a host readback to sync.
    key = jax.random.PRNGKey(0)
    state = trainer.state
    t_c = time.perf_counter()
    for _ in range(5):
        key, k = jax.random.split(key)
        state, loss = step_fn(state, k, epoch)
    compile_s = time.perf_counter() - t_c
    float(loss)

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        state, loss = step_fn(state, k, epoch)
    float(loss)
    dt = time.perf_counter() - t0

    rays = cfg["train"]["real_ray_num"] * n_steps
    rays_per_sec = rays / dt
    print(json.dumps({
        "metric": "rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "steps_per_sec": round(n_steps / dt, 2),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        "loss": float(loss),
    }))


if __name__ == "__main__":
    main()
