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


def _sharded_real_body(trainer: Trainer):
    """The one real-view step body shared by the single-dispatch and chained
    sharded steps: loss → grads → pending-grad fold → optimizer. Mirrors the
    single-chip trainer._real_step_body; keeping it in one place guarantees
    chained and unchained dp training cannot diverge."""
    curr = trainer.curr

    def body(st: TrainState, batch, bg_color, key, epoch):
        lr = curr.learning_rate(epoch)
        max_level = curr.max_level(epoch)
        # occupancy EMA update (reference morpheus.py:905-913) — replicated
        # (the grid is replicated state; the sampled density query is cheap
        # relative to the step). Key-split layout matches the single-chip
        # _real_step_body bit-for-bit, so given the same key/params/step the
        # dp and single-chip occupancy trajectories are identical. Round-4
        # verdict: this update was MISSING here — under data-parallel
        # training the grid stayed at its optimistic init forever (no
        # empty-space pruning; silent semantics divergence from single-chip).
        k_occ, k_loss, k_t = jax.random.split(key, 3)
        t_occ = jax.random.uniform(k_t)
        occ = trainer._maybe_update_occ(st.occ, st.params, k_occ,
                                        st.global_step, t_occ)

        def loss_fn(params):
            loss, _ = trainer.real_loss_from_batch(
                params, occ, k_loss, epoch, max_level, batch, bg_color)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        # fold in carried virtual-step gradients, then clear them — mirrors
        # the single-chip real step (trainer.py _make_real_step)
        grads = jax.tree.map(jnp.add, grads, st.pending_grads)
        zeros = jax.tree.map(jnp.zeros_like, st.pending_grads)
        if trainer.optim_name == "adan":
            opt_state, params = optim.adan_update(st.opt_state, grads,
                                                  st.params, lr, 0.0)
        else:
            opt_state, params = optim.adam_update(st.opt_state, grads,
                                                  st.params, lr, 0.0)
        # GradScaler-parity skip, mirroring trainer._real_step_body
        ok = trainer._grads_finite(grads)
        params = trainer._select_state(ok, params, st.params)
        opt_state = trainer._select_state(ok, opt_state, st.opt_state)
        new_state = TrainState(params, opt_state, st.ema, occ,
                               st.global_step + 1, zeros)
        return new_state, loss

    return body


def make_sharded_real_step(trainer: Trainer, mesh: Mesh, axis: str = "rays"):
    """Jit the full real-view train step (loss → grads → Adam) with the ray
    batch sharded over `axis`; params/opt/occ replicated. Returns
    step(state, batch, bg_color, key, epoch) -> (state, loss)."""
    replicated = NamedSharding(mesh, P())
    return jax.jit(_sharded_real_body(trainer),
                   out_shardings=(replicated, replicated))


def make_sharded_real_steps_chained(trainer: Trainer, mesh: Mesh, n: int,
                                    axis: str = "rays"):
    """n consecutive sharded real steps in ONE jitted lax.scan (the multi-chip
    analogue of trainer._make_real_steps_chained): the scan consumes a stack
    of n host-sampled batches (leading axis n, ray axis sharded over the
    mesh) and splits the key per step exactly like the host loop, amortizing
    the per-dispatch RPC n-fold. Returns
    steps(state, batches, bgs, key, epoch) -> (state, key, last_loss)."""
    replicated = NamedSharding(mesh, P())
    body = _sharded_real_body(trainer)

    def steps(state: TrainState, batches, bgs, key, epoch):
        def one(carry, xs):
            st, ky = carry
            batch, bg_color = xs
            ky, k = jax.random.split(ky)
            st2, loss = body(st, batch, bg_color, k, epoch)
            return (st2, ky), loss

        (state, key), losses = jax.lax.scan(one, (state, key),
                                            (batches, bgs), length=n)
        return state, key, losses[-1]

    return jax.jit(steps,
                   out_shardings=(replicated, replicated, replicated))


def shard_batch_stacked(batch: dict, mesh: Mesh, axis: str = "rays") -> dict:
    """Place a stack of n batches (leading axis n, per-ray axis second) with
    the RAY axis sharded over the mesh — the scan input layout for
    make_sharded_real_steps_chained."""
    out = {}
    for k, v in batch.items():
        if (hasattr(v, "ndim") and v.ndim >= 2
                and v.shape[1] % mesh.devices.size == 0):
            spec = P(None, axis, *([None] * (v.ndim - 2)))
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def make_sharded_virtual_step(trainer: Trainer, mesh: Mesh,
                              scale: float | None = None, axis: str = "rays"):
    """Jit the virtual/SDS train step with a batch of V views sharded over the
    mesh (one full view — render + VAE encode + UNet CFG — per device; the SDS
    workload is embarrassingly data-parallel over views). Gradients are the
    mean over views; params/opt/occ replicated. Returns
    step(state, guidance, embeddings, batch, key, epoch) -> (state, loss) —
    guidance/embeddings are jit arguments so the Zero123 weights never become
    HLO constants. Batch arrays carry a leading V axis (see
    host_sample_virtual_batch)."""
    replicated = NamedSharding(mesh, P())
    curr = trainer.curr
    vf = trainer.config["train"]["virtual_freq"]
    sampler = data_lib.VirtualViewSampler(
        trainer.dataset, trainer.config,
        scale if scale is not None else
        trainer.config["data"]["novel_view_scale"])
    H, W = sampler.H, sampler.W

    n_dev = mesh.devices.size

    def step(state: TrainState, guidance, embeddings, batch, key, epoch):
        lr = curr.learning_rate(epoch)
        max_level = curr.max_level(epoch)
        freeze = curr.freeze_deform(epoch)
        v_loc = batch["rays_id"].shape[0] // n_dev
        # occupancy EMA update, replicated — same key-split layout as the
        # single-chip _make_virtual_step so dp/single-chip occ trajectories
        # match (was missing pre-round-5: see _sharded_real_body note)
        k_occ, key, k_t = jax.random.split(key, 3)
        t_occ = jax.random.uniform(k_t)
        occ_new = trainer._maybe_update_occ(state.occ, state.params, k_occ,
                                            state.global_step, t_occ)

        # shard_map (not vmap): each device traces its local views unbatched —
        # the hash-grid linear_call VJP has no batching rule, and per-view
        # execution is exactly the parallelism we want anyway.
        def local_grads(params, occ, g, emb, batch_shard, key):
            kd = jax.random.fold_in(key, jax.lax.axis_index(axis))

            def loss_fn(p):
                total = 0.0
                diag0 = {}
                for i in range(v_loc):
                    b = jax.tree.map(lambda x: x[i], batch_shard)
                    li, out = trainer.virtual_loss_from_batch(
                        p, occ, jax.random.fold_in(kd, i), epoch, max_level,
                        b, H, W, guidance=g, embeddings=emb)
                    total += li
                    if i == 0:
                        diag0 = out.get("sds_diag", {})
                return total / v_loc, diag0

            (loss, diag), grads = jax.value_and_grad(loss_fn,
                                                     has_aux=True)(params)
            return (jax.lax.pmean(loss, axis),
                    jax.tree.map(lambda g_: jax.lax.pmean(g_, axis), grads),
                    jax.lax.stop_gradient(diag))

        # diag (save_guidance panels, zero123_utils.py:215-231) comes back
        # concatenated along the view axis — one local view per device; the
        # host keeps device 0's panel
        loss, grads, diag = jax.shard_map(
            local_grads, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(axis), P()),
            out_specs=(P(), P(), P(axis)), check_vma=False)(
                state.params, occ_new, guidance, embeddings, batch, key)
        grads = jax.tree.map(lambda a: a / vf, grads)
        # GradScaler-parity skip, mirroring trainer._make_virtual_step
        ok = trainer._grads_finite(grads)
        grads = trainer._select_state(
            ok, grads, jax.tree.map(jnp.zeros_like, grads))

        # same freeze semantics as the single-chip virtual step: apply now
        # with deform groups frozen, or carry grads into the next real step
        def apply_now(_):
            if trainer.optim_name == "adan":
                os_, p_ = optim.adan_update(state.opt_state, grads,
                                            state.params, lr, 1.0)
            else:
                os_, p_ = optim.adam_update(state.opt_state, grads,
                                            state.params, lr, 1.0)
            os_ = trainer._select_state(ok, os_, state.opt_state)
            p_ = trainer._select_state(ok, p_, state.params)
            return os_, p_, jax.tree.map(jnp.zeros_like, grads)

        def carry(_):
            return (state.opt_state, state.params,
                    jax.tree.map(jnp.add, state.pending_grads, grads))

        opt_state, params, pending = jax.lax.cond(freeze > 0.5, apply_now,
                                                  carry, None)
        new_state = TrainState(params, opt_state, state.ema, occ_new,
                               state.global_step + 1, pending)
        return new_state, loss, diag

    return jax.jit(step, out_shardings=(replicated, replicated, None)), sampler


def sample_virtual_batch(sampler, key, n_views: int) -> dict:
    """Stack n_views independent virtual views into leading-axis-V arrays
    suitable for shard_batch (per-view scalars become (V,) arrays)."""
    views = []
    for k in jax.random.split(key, n_views):
        b = dict(sampler.sample(k))
        b.pop("H")
        b.pop("W")
        b["frame_idx"] = jnp.asarray(b["frame_idx"], jnp.int32)
        views.append(b)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *views)


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
