"""Per-scene optimization trainer (reference: morpheus.py MorpheuS class).

Everything inside a step — ray sampling, occupancy EMA update, pose correction,
marching, field eval, all losses, Adam/Adan update — is one jit-compiled
function; the Python epoch loop only feeds (epoch, PRNG key) scalars and
handles periodic eval/meshing (reference train(): morpheus.py:1435-1519).
"""
from __future__ import annotations

import os
import pickle
import time
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import renderer
from ..data import dataset as data_lib
from ..model import field
from ..ops import density as density_lib
from ..ops import occupancy
from . import losses, optim
from .schedule import Curriculum


class TrainState(NamedTuple):
    params: dict
    opt_state: Any
    ema: dict
    occ: occupancy.OccupancyState
    global_step: jnp.ndarray


class Trainer:
    def __init__(self, config: dict, dataset: data_lib.DeformDataset,
                 guidance=None, workspace: str | None = None, seed: int | None = None):
        self.config = config
        self.dataset = dataset
        self.guidance = guidance
        self.workspace = workspace or os.path.join(config["exp"]["output"],
                                                   config["exp"]["exp_name"])
        seed = config["exp"].get("seed", 2024) if seed is None else seed
        self.key = jax.random.PRNGKey(seed)

        self.curr = Curriculum.from_config(config)
        self.bound = dataset.bound
        from ..ops.hashgrid import HashGridSpec
        grid = HashGridSpec(
            input_dim=3,
            num_levels=config["model"].get("grid_num_levels", 16),
            level_dim=config["model"].get("grid_level_dim", 2),
            base_resolution=config["model"].get("grid_base_resolution", 16),
            log2_hashmap_size=config["model"].get("grid_log2_hashmap_size", 15),
            desired_resolution=config["model"].get("grid_desired_resolution", 128))
        self.spec = field.FieldSpec(
            grid=grid,
            num_frames=dataset.num_frames, bound=self.bound,
            deform_dim=config["model"]["deform_dim"],
            amb_dim=config["model"]["amb_dim"],
            use_t=config["model"]["use_t"],
            use_app=config["model"]["use_app"],
            use_joint=config["model"]["use_joint"],
            color_grid=config["model"]["color_grid"],
            encode_topo=config["model"]["encode_topo"],
            bg_radius=config["model"]["bg_radius"])
        self.rcfg = renderer.RenderConfig.from_config(config, dataset.num_frames,
                                                      self.bound)
        self.data = dataset.device_data(scale=config["data"]["known_view_scale"])

        self.key, k_init = jax.random.split(self.key)
        params = field.init_field(k_init, self.spec)
        self.optim_name = config["train"]["optim"]
        if self.optim_name == "adan":
            opt_state = optim.adan_init(params)
        else:
            opt_state = optim.adam_init(params)
        self.state = TrainState(
            params=params, opt_state=opt_state,
            ema=optim.ema_init(params),
            occ=occupancy.init_occupancy(config["tpu"]["occ_resolution"]),
            global_step=jnp.zeros((), jnp.int32))
        self.epoch = 0
        self._jit_cache: dict = {}

    # ---- pieces used inside jit ----

    def _occ_density_fn(self, params, t_scalar):
        def fn(x):
            return field.query_density(params, self.spec, x, t=t_scalar,
                                       return_color=False)["sigma"]
        return fn

    def _maybe_update_occ(self, occ, params, key, step, t_scalar):
        tpu = self.config["tpu"]
        dens = self._occ_density_fn(params, t_scalar)

        def do_update(occ):
            def warm(occ):
                return occupancy.update_occupancy(
                    occ, key, dens, step, self.bound,
                    self.config["render"]["step_size"],
                    warmup_steps=tpu["occ_warmup_steps"],
                    ema_decay=tpu["occ_ema_decay"],
                    threshold=tpu["occ_threshold"])

            def sampled(occ):
                return occupancy.update_occupancy_sampled(
                    occ, key, dens, self.bound,
                    self.config["render"]["step_size"],
                    ema_decay=tpu["occ_ema_decay"],
                    threshold=tpu["occ_threshold"])

            return jax.lax.cond(step < tpu["occ_warmup_steps"], warm, sampled,
                                occ)

        return jax.lax.cond(step % tpu["occ_update_every"] == 0, do_update,
                            lambda o: o, occ)

    def _real_loss(self, params, occ, key, epoch, max_level):
        """Real-view loss (reference: train_step(real_view=True) path,
        morpheus.py:1147-1212)."""
        tr = self.config["train"]
        k_s, k_bg, k_r = jax.random.split(key, 3)
        batch = data_lib.sample_real_view_rays(k_s, self.data,
                                               self.dataset.num_frames,
                                               tr["real_ray_num"])
        N = batch["rays_o"].shape[0]
        bg_color = jax.random.uniform(k_bg, (N, 3))
        return self.real_loss_from_batch(params, occ, k_r, epoch, max_level,
                                         batch, bg_color)

    def real_loss_from_batch(self, params, occ, k_r, epoch, max_level, batch,
                             bg_color):
        """Loss on an explicit ray batch (used by the sharded multi-chip step,
        parallel/sharding.py, where the batch is sharded over devices)."""
        tr = self.config["train"]
        N = batch["rays_o"].shape[0]
        out = renderer.render_rays(
            params, self.spec, occ, k_r,
            batch["rays_o"], batch["rays_d"], batch["rays_t"], batch["rays_id"],
            self.rcfg, bg_color=bg_color, ambient_ratio=1.0,
            shading_id=field.SHADING_LAMBERTIAN,  # 'albedo_normal': ratio=1
            real_view=True, rays_depth=batch["depth"], rays_mask=batch["mask"],
            optimize_pose=True, max_level=max_level, train=True)

        gt_mask = (batch["mask"] > 0.5).astype(jnp.float32)
        gt_rgb = batch["image"] * gt_mask[:, None] + bg_color * (1 - gt_mask[:, None])
        gt_depth = batch["depth"]

        ori_w, rgb_w, beta_w = self.curr.loss_weights(epoch)

        loss = rgb_w * losses.rgb_loss(out["image"], gt_rgb)
        if tr["mask_weight"] > 0:
            loss += tr["mask_weight"] * losses.mask_loss(out["opacity"], gt_mask)
        if tr["depth_weight"] > 0:
            loss += tr["depth_weight"] * losses.depth_loss(
                out["depth"], gt_depth, batch["rays_o"], batch["rays_d"], gt_mask)
        if tr["sdf_weight"] > 0:
            loss += tr["sdf_weight"] * out["sdf_loss"]
        if tr["fs_weight"] > 0:
            loss += tr["fs_weight"] * out["fs_loss"]

        # surface point losses (morpheus.py:1001-1027)
        if tr["surf_sdf_weight"] > 0:
            xyzs = batch["rays_o"] + gt_depth[:, None] * batch["rays_d"]
            pts_norm = jnp.linalg.norm(xyzs, axis=-1)
            dm = ((gt_depth > 0) & (pts_norm <= self.rcfg.outside_radius)
                  & (gt_mask > 0.5))
            res = field.query_density(params, self.spec, xyzs,
                                      t=batch["rays_t"], max_level=max_level)
            n_valid = jnp.sum(dm) + 1e-8
            surf_sdf = jnp.sum(jnp.where(dm, res["sdf"] ** 2, 0.0)) / n_valid
            # color supervised at the surface; reference multiplies both sides
            # by the mask and takes a full-size MSE mean
            cerr = jnp.sum((res["albedo"] - gt_rgb) ** 2, -1) / 3.0
            surf_color = jnp.sum(jnp.where(dm, cerr, 0.0)) / N
            loss += tr["surf_sdf_weight"] * surf_sdf
            loss += tr["surf_color_weight"] * surf_color

        loss += self._reg_loss(params, out, ori_w, beta_w, epoch)
        return loss, out

    def _reg_loss(self, params, out, ori_w, beta_w, epoch):
        """Shared regularizers (morpheus.py:1090-1145)."""
        tr = self.config["train"]
        loss = 0.0
        if "loss_orient" in out:
            loss += ori_w * out["loss_orient"]
        if tr["normal_smooth_3d"] > 0 and "loss_normal_perturb" in out:
            loss += tr["normal_smooth_3d"] * out["loss_normal_perturb"]
        if tr["eik_weight"] > 0 and "normal_raw_eik" in out:
            loss += tr["eik_weight"] * out["normal_raw_eik"]
        loss += beta_w * density_lib.laplace_beta(params["beta"])
        if tr["normal_smoothness"] > 0 and "normal_reg" in out:
            loss += tr["normal_smoothness"] * out["normal_reg"]
        if tr["deform_weight"] > 0 and "deform_abs" in out:
            loss += tr["deform_weight"] * out["deform_abs"]
        if tr["code_reg"] > 0 and "loss_code" in out:
            loss += tr["code_reg"] * out["loss_code"]
        if tr["entropy_weight"] > 0:
            loss += tr["entropy_weight"] * losses.entropy_loss(out["weights"],
                                                               out["mask"])
        return loss

    # ---- jitted steps ----

    def _make_real_step(self):
        curr = self.curr

        @jax.jit
        def real_step(state: TrainState, key, epoch):
            step = state.global_step
            lr = curr.learning_rate(epoch)
            max_level = curr.max_level(epoch)
            k_occ, k_loss, k_t = jax.random.split(key, 3)

            t_occ = jax.random.uniform(k_t)
            occ = self._maybe_update_occ(state.occ, state.params, k_occ, step,
                                         t_occ)

            def loss_fn(params):
                loss, out = self._real_loss(params, occ, k_loss, epoch,
                                            max_level)
                return loss, out

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            if self.optim_name == "adan":
                opt_state, params = optim.adan_update(
                    state.opt_state, grads, state.params, lr, 0.0)
            else:
                opt_state, params = optim.adam_update(
                    state.opt_state, grads, state.params, lr, 0.0)
            return TrainState(params, opt_state, state.ema, occ,
                              step + 1), loss

        return real_step

    def _make_ema_step(self):
        decay = self.config["train"]["ema_decay"]

        @jax.jit
        def ema_step(state: TrainState):
            return state._replace(ema=optim.ema_update(state.ema, state.params,
                                                       decay))
        return ema_step

    # ---- epoch loop (recon-only; SDS virtual steps are added by the
    #      guidance-aware trainer in guidance/sds_trainer.py) ----

    def train_one_epoch(self, n_iters: int | None = None):
        tr = self.config["train"]
        n_iters = n_iters or tr.get("n_iters", 10)
        if "real" not in self._jit_cache:
            self._jit_cache["real"] = self._make_real_step()
            self._jit_cache["ema"] = self._make_ema_step()
        real_step = self._jit_cache["real"]
        epoch = jnp.asarray(self.epoch, jnp.float32)
        loss = jnp.nan
        for _ in range(n_iters):
            for _ in range(tr["real_freq"]):
                self.key, k = jax.random.split(self.key)
                self.state, loss = real_step(self.state, k, epoch)
        self.state = self._jit_cache["ema"](self.state)
        return float(loss)

    def train(self, max_epochs: int | None = None, log=print):
        max_epochs = max_epochs or self.config["train"]["n_epochs"]
        for epoch in range(self.epoch + 1, max_epochs + 1):
            self.epoch = epoch
            t0 = time.time()
            loss = self.train_one_epoch()
            log(f"epoch {epoch}/{max_epochs} loss={loss:.4f} "
                f"({time.time() - t0:.2f}s)")
        return self.state

    # ---- checkpointing (reference: morpheus.py:329-358) ----

    def save_ckpt(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        payload = {
            "state": jax.tree.map(np.asarray, self.state._asdict()),
            "epoch": self.epoch,
            "optim": self.optim_name,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load_ckpt(self, path: str):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        st = payload["state"]
        self.state = TrainState(
            params=jax.tree.map(jnp.asarray, st["params"]),
            opt_state=jax.tree.map(jnp.asarray, st["opt_state"]),
            ema=jax.tree.map(jnp.asarray, st["ema"]),
            occ=occupancy.OccupancyState(
                occs=jnp.asarray(st["occ"].occs),
                binaries=jnp.asarray(st["occ"].binaries)),
            global_step=jnp.asarray(st["global_step"]))
        self.epoch = payload["epoch"]
