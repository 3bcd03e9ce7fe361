"""Multi-chip scale-out over ICI (no reference equivalent — the reference is
strictly single-GPU, SURVEY.md §2 'parallelism: none').

Strategy (SURVEY.md §7 stage 9): the per-scene optimization is data-parallel in
*rays* — the batch axis of every per-ray tensor is sharded over the 'rays' mesh
axis, parameters and occupancy state are replicated, and XLA inserts the psum
for the gradient reduction during jit lowering. The same mesh shards dense mesh-
extraction grid queries. Multi-host DCN fan-out runs independent scenes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data import dataset as data_lib
from ..train import optim
from ..train.trainer import Trainer, TrainState


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "rays") -> dict:
    """Place every per-ray array with its leading dim sharded over the mesh."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] % mesh.devices.size == 0:
            spec = P(axis, *([None] * (v.ndim - 1)))
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def make_sharded_real_step(trainer: Trainer, mesh: Mesh, axis: str = "rays"):
    """Jit the full real-view train step (loss → grads → Adam) with the ray
    batch sharded over `axis`; params/opt/occ replicated. Returns
    step(state, batch, bg_color, key, epoch) -> (state, loss)."""
    replicated = NamedSharding(mesh, P())
    curr = trainer.curr

    def step(state: TrainState, batch, bg_color, key, epoch):
        lr = curr.learning_rate(epoch)
        max_level = curr.max_level(epoch)

        def loss_fn(params):
            loss, _ = trainer.real_loss_from_batch(
                params, state.occ, key, epoch, max_level, batch, bg_color)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if trainer.optim_name == "adan":
            opt_state, params = optim.adan_update(state.opt_state, grads,
                                                  state.params, lr, 0.0)
        else:
            opt_state, params = optim.adam_update(state.opt_state, grads,
                                                  state.params, lr, 0.0)
        new_state = TrainState(params, opt_state, state.ema, state.occ,
                               state.global_step + 1)
        return new_state, loss

    return jax.jit(step, out_shardings=(replicated, replicated))


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), state)


def host_sample_real_batch(rng: np.random.Generator, data: dict,
                           num_frames: int, ray_num: int) -> tuple[dict, np.ndarray]:
    """Host-side batch assembly for the sharded step (one random frame,
    ray_num random pixels) — mirrors data_lib.sample_real_view_rays but in
    numpy so the result can be device_put with shardings."""
    frame = int(rng.integers(0, num_frames))
    n_pix = int(np.asarray(data["rays_d_cam"]).shape[0])
    pix = rng.integers(0, n_pix, size=ray_num)

    pose = np.asarray(data["poses"][frame])
    d_cam = np.asarray(data["rays_d_cam"])[pix]
    rays_o = np.broadcast_to(pose[:3, 3], (ray_num, 3)).copy()
    rays_d = np.einsum("nk,kj->nj", d_cam, pose[:3, :3].T)
    batch = {
        "rays_o": rays_o.astype(np.float32),
        "rays_d": rays_d.astype(np.float32),
        "rays_t": np.full((ray_num, 1), frame / num_frames, np.float32),
        "rays_id": np.full((ray_num,), frame, np.int32),
        "image": np.asarray(data["images"][frame])[pix],
        "depth": np.asarray(data["depths"][frame])[pix],
        "mask": np.asarray(data["masks"][frame])[pix],
    }
    bg_color = rng.uniform(size=(ray_num, 3)).astype(np.float32)
    return batch, bg_color
