"""Benchmark: rays/sec/chip during real-view optimization (the BASELINE.md
north-star metric). Prints ONE JSON line.

Runs the full jitted train step (occupancy marching, field eval with normals,
all losses, grads, Adam) on a synthetic scene at reference-scale settings:
2048 rays/step (morpheus.py:826), 128³ occupancy grid, 16-level hash grid,
step_size 0.01, at the epoch-300 curriculum point (coarse-to-fine has 10/16
hash levels unlocked — exactly what a real run executes there; `late` reports
the all-16-level step). vs_baseline is rays/sec against a 30k rays/sec
reference-GPU estimate (220k steps × ~2.2k rays in ~4.5h on A100 — the
reference publishes no number, BASELINE.json "published": {}).
"""
from __future__ import annotations

import json
import time

import jax
import numpy as np

BASELINE_RAYS_PER_SEC = 30000.0


def _time_steps(step_fn, state, epoch, n=20, warmup=5):
    key = jax.random.PRNGKey(0)
    t_c = time.perf_counter()
    for _ in range(warmup):
        key, k = jax.random.split(key)
        state, loss = step_fn(state, k, epoch)
    compile_s = time.perf_counter() - t_c
    float(loss)  # block_until_ready is a no-op on axon — force readback
    t0 = time.perf_counter()
    for _ in range(n):
        key, k = jax.random.split(key)
        state, loss = step_fn(state, k, epoch)
    float(loss)
    return (time.perf_counter() - t0) / n, compile_s, state, loss


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
        "tpu": {"max_samples_per_ray": 64, "march_steps": 288,
                "occ_resolution": 128, "occ_warmup_steps": 256,
                "occ_update_every": 16},
    })
    scene = make_synthetic_scene(num_frames=8, H=128, W=128)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    trainer = Trainer(cfg, ds)

    rays = cfg["train"]["real_ray_num"]

    # real-view step at the epoch-300 operating point (10/16 levels unlocked)
    trainer.epoch = 300
    epoch = jax.numpy.asarray(300.0)
    step_fn = trainer._make_real_step(trainer._active_levels())
    dt, compile_s, state, loss = _time_steps(step_fn, trainer.state, epoch)
    rays_per_sec = rays / dt

    # late-curriculum step: all 16 levels active (epoch > 0.95 * n_epochs)
    trainer.epoch = 1900
    epoch_late = jax.numpy.asarray(1900.0)
    step_late = trainer._make_real_step(trainer._active_levels())
    dt_late, _, _, _ = _time_steps(step_late, state, epoch_late, n=10)

    print(json.dumps({
        "metric": "rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "steps_per_sec": round(1.0 / dt, 2),
        "rays_per_sec_late": round(rays / dt_late, 1),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        "loss": float(loss),
    }))


if __name__ == "__main__":
    main()
