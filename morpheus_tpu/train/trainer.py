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
    # virtual-step gradients carried into the next real step once the deform
    # freeze ends (reference accumulates .grad across the virtual→real
    # boundary, morpheus.py:1393-1424)
    pending_grads: dict | None = None


class Trainer:
    def __init__(self, config: dict, dataset: data_lib.DeformDataset,
                 guidance=None, guidance_spec=None,
                 workspace: str | None = None, seed: int | None = None):
        self.config = config
        self.dataset = dataset
        self.guidance = guidance
        if guidance is not None and guidance_spec is None:
            from ..guidance.zero123 import Zero123Spec
            guidance_spec = Zero123Spec()
        self.guidance_spec = guidance_spec
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
            desired_resolution=config["model"].get("grid_desired_resolution", 128),
            grad_payload=config["tpu"].get("grad_payload", "float32"),
            vjp_mode=config["tpu"].get("vjp_mode", "hist_rows"))
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
            bg_radius=config["model"]["bg_radius"],
            compute_dtype=config["tpu"].get("compute_dtype", "float32"),
            mlp_dtype=config["tpu"].get("mlp_dtype", "float32"))
        self.rcfg = renderer.RenderConfig.from_config(config, dataset.num_frames,
                                                      self.bound)
        # occupancy density queries: nearest-corner hash lookup (8x fewer
        # gathered rows; the EMA grid's binarization at occ_resolution can't
        # resolve sub-cell lerp detail). One occ update at the bench point is
        # ~45 ms of gather with lerp vs ~6 ms nearest (v5e device trace,
        # round 3). tpu.occ_query_interp: 'nearest' (default) | 'linear'
        # (exact reference NeRFAcc semantics, morpheus.py:196-202,905-913).
        import dataclasses as _dc
        occ_interp = config["tpu"].get("occ_query_interp", "nearest")
        self.occ_spec = (self.spec if occ_interp == "linear" else _dc.replace(
            self.spec, grid=_dc.replace(grid, interpolation=occ_interp)))
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
            global_step=jnp.zeros((), jnp.int32),
            pending_grads=jax.tree.map(jnp.zeros_like, params))
        self.epoch = 0
        self._jit_cache: dict = {}
        self._embeddings = None
        self._panel_fn = None

        # multi-chip data parallelism over ICI (tpu.data_parallel chips; rays
        # sharded on real steps, one view per chip on virtual steps)
        self.dp = int(config["tpu"].get("data_parallel", 1))
        self.mesh = None
        if self.dp > 1:
            from ..parallel import sharding
            n_dev = len(jax.devices())
            if n_dev < self.dp:
                raise RuntimeError(
                    f"tpu.data_parallel={self.dp} but only {n_dev} devices "
                    "are visible")
            if config["train"]["real_ray_num"] % self.dp:
                raise ValueError("train.real_ray_num must be divisible by "
                                 "tpu.data_parallel")
            self.mesh = sharding.make_mesh(self.dp)
            self.state = sharding.replicate_state(self.state, self.mesh)
            self._np_rng = np.random.default_rng(seed)
        if guidance is not None:
            self._embeddings = self.precompute_embeddings(guidance)
            # the CLIP tower is only needed for that one-time embed pass; at
            # real scale its ViT-L params are ~1.2 GB f32 that would otherwise
            # stay HBM-resident for the whole run as an unused leaf of the
            # guidance jit argument (every virtual step ships the full tree).
            # Keep a host copy for ad-hoc use (novel_view_sample) and pass an
            # empty subtree through the step jits.
            self._clip_params_host = jax.tree.map(np.asarray,
                                                  guidance.clip_params)
            self.guidance = guidance._replace(clip_params=())

    # ---- pieces used inside jit ----

    def _occ_density_fn(self, params, t_scalar, spec=None):
        spec = spec or self.spec
        if spec.grid.interpolation != self.occ_spec.grid.interpolation:
            import dataclasses as _dc
            spec = _dc.replace(spec, grid=_dc.replace(
                spec.grid,
                interpolation=self.occ_spec.grid.interpolation))

        def one(x):
            return field.query_density(params, spec, x, t=t_scalar,
                                       return_color=False)["sigma"]

        def fn(x):
            # chunk large grids (warmup evaluates all R^3 cells): one call at
            # 128^3 builds a 268M-row gather whose boundary tensors can't be
            # fused/tiled sanely (bf16 OOMs at compile); lax.map bounds the
            # live set per chunk. Non-divisible sizes are padded up so e.g. a
            # 100^3 grid still chunks instead of falling back to one huge call
            M, chunk = x.shape[0], 32768
            if M <= chunk:
                return one(x)
            pad = (-M) % chunk
            if pad:
                x = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], 0)
            out = jax.lax.map(one, x.reshape(-1, chunk, 3))
            return out.reshape(-1)[:M]
        return fn

    def _maybe_update_occ(self, occ, params, key, step, t_scalar, spec=None):
        tpu = self.config["tpu"]
        dens = self._occ_density_fn(params, t_scalar, spec)

        def do_update(occ):
            def warm(occ):
                return occupancy.update_occupancy(
                    occ, key, dens, step, self.bound,
                    self.config["render"]["step_size"],
                    warmup_steps=tpu["occ_warmup_steps"],
                    ema_decay=tpu["occ_ema_decay"],
                    threshold=tpu["occ_threshold"])

            def sampled(occ):
                upd_idx = step // tpu["occ_update_every"]
                return occupancy.update_occupancy_sampled(
                    occ, key, dens, self.bound,
                    self.config["render"]["step_size"],
                    ema_decay=tpu["occ_ema_decay"],
                    threshold=tpu["occ_threshold"],
                    sample_fraction=tpu.get("occ_sample_fraction", 0.25),
                    update_index=upd_idx)

            return jax.lax.cond(step < tpu["occ_warmup_steps"], warm, sampled,
                                occ)

        return jax.lax.cond(step % tpu["occ_update_every"] == 0, do_update,
                            lambda o: o, occ)

    def _real_loss(self, params, data, occ, key, epoch, max_level, spec=None):
        """Real-view loss (reference: train_step(real_view=True) path,
        morpheus.py:1147-1212). `data` is the device dataset dict, passed as
        a traced jit ARGUMENT (not closure-captured): a closed-over device
        array is inlined as an MLIR constant, which (a) duplicates ~100 MB of
        dataset into every compiled step variant's HBM footprint and (b)
        requires a device→host fetch at trace time — observed to die with
        RESOURCE_EXHAUSTED at the epoch-800 curriculum transition of the
        full-budget v5e run, when the full-scale Zero123 weights (~5 GB)
        plus the freshly compiled scale-0.5 virtual step left no headroom."""
        tr = self.config["train"]
        k_s, k_bg, k_r = jax.random.split(key, 3)
        batch = data_lib.sample_real_view_rays(k_s, data,
                                               self.dataset.num_frames,
                                               tr["real_ray_num"])
        if tr["real_view_noise"] > 0:
            # one shared 3-vector of noise per step, added to origins and
            # directions (morpheus.py:858-860)
            k_no, k_nd = jax.random.split(jax.random.fold_in(k_s, 1))
            batch = dict(batch)
            batch["rays_o"] = batch["rays_o"] + jax.random.normal(
                k_no, (3,)) * tr["real_view_noise"]
            batch["rays_d"] = batch["rays_d"] + jax.random.normal(
                k_nd, (3,)) * tr["real_view_noise"]
        N = batch["rays_o"].shape[0]
        bg_color = jax.random.uniform(k_bg, (N, 3))
        return self.real_loss_from_batch(params, occ, k_r, epoch, max_level,
                                         batch, bg_color, spec=spec)

    def real_loss_from_batch(self, params, occ, k_r, epoch, max_level, batch,
                             bg_color, spec=None):
        """Loss on an explicit ray batch (used by the sharded multi-chip step,
        parallel/sharding.py, where the batch is sharded over devices)."""
        spec = spec or self.spec
        tr = self.config["train"]
        N = batch["rays_o"].shape[0]
        out = renderer.render_rays(
            params, spec, occ, k_r,
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
        if tr["sdf_reg"] > 0:
            # mean squared SDF over valid samples (morpheus.py:994-995; the
            # reference reads an out-of-scope `pred_sdf` there — a latent
            # NameError when enabled — the intended mean(sdf**2) is used here)
            m = out["mask"].astype(jnp.float32)
            loss += tr["sdf_reg"] * (jnp.sum(out["sdf"] ** 2 * m)
                                     / (jnp.sum(m) + 1e-8))
        if tr["fs_weight"] > 0:
            loss += tr["fs_weight"] * out["fs_loss"]

        # surface point losses (morpheus.py:1001-1027)
        if tr["surf_sdf_weight"] > 0:
            xyzs = batch["rays_o"] + gt_depth[:, None] * batch["rays_d"]
            pts_norm = jnp.linalg.norm(xyzs, axis=-1)
            dm = ((gt_depth > 0) & (pts_norm <= self.rcfg.outside_radius)
                  & (gt_mask > 0.5))
            res = field.query_density(params, spec, xyzs,
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
        if tr["normal_smooth_3d_t"] > 0 and "loss_normal_perturb_t" in out:
            loss += tr["normal_smooth_3d_t"] * out["loss_normal_perturb_t"]
        if tr["deform_smooth"] > 0 and "loss_deform_perturb" in out:
            loss += tr["deform_smooth"] * out["loss_deform_perturb"]
        if tr["deform_smooth_t"] > 0 and "loss_deform_perturb_t" in out:
            loss += tr["deform_smooth_t"] * out["loss_deform_perturb_t"]
        if tr["topo_smooth_t"] > 0 and "loss_topo_perturb_t" in out:
            loss += tr["topo_smooth_t"] * out["loss_topo_perturb_t"]
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

    def _spec_for_levels(self, active_levels):
        import dataclasses
        if active_levels is None or active_levels >= self.spec.grid.num_levels:
            return self.spec
        return dataclasses.replace(self.spec, active_levels=active_levels)

    def _make_real_step(self, active_levels=None):
        """Jitted single real step with the dataset bound as a traced
        argument (see _real_loss on why it must not be a closure constant).
        The returned callable keeps the historical (state, key, epoch)
        surface; .lower is forwarded for HLO/cost inspection."""
        jitted = jax.jit(self._real_step_body(active_levels))
        data = self.data

        def step(state, key, epoch):
            return jitted(state, data, key, epoch)

        step.lower = lambda state, key, epoch: jitted.lower(state, data, key,
                                                            epoch)
        return step

    def _make_real_steps_chained(self, active_levels=None, n: int = 10):
        """n consecutive real steps in ONE jitted lax.scan. Over the axon
        tunnel each dispatch is an RPC (~10 ms of host overhead per step in
        the epoch loop vs the isolated-step time, RESULTS.md); chaining
        real_freq steps amortizes it n-fold. The scan body carries
        (state, key) and splits the key exactly like the host loop
        (key, k = split(key)), so the step/RNG sequence is identical to
        n separate real_step calls (params match to XLA compile noise —
        the scan body fuses differently). Compile cost ~= one step (scan
        compiles the body once)."""
        body = self._real_step_body(active_levels)
        donate = (0,) if self.config["tpu"].get("donate_state", True) else ()

        @partial(jax.jit, donate_argnums=donate)
        def real_steps(state: TrainState, data, key, epoch):
            def one(carry, _):
                st, ky = carry
                ky, k = jax.random.split(ky)
                st, loss = body(st, data, k, epoch)
                return (st, ky), loss

            (state, key), losses = jax.lax.scan(one, (state, key), None,
                                                length=n)
            return state, key, losses[-1]

        data = self.data

        def steps(state, key, epoch):
            return real_steps(state, data, key, epoch)

        # forwarded like _make_real_step so AOT consumers (bench cache
        # prewarm, HLO dumps) can lower the exact executable this runs
        steps.lower = lambda state, key, epoch: real_steps.lower(state, data,
                                                                 key, epoch)
        return steps

    @staticmethod
    def _grads_finite(grads):
        """True iff every gradient leaf is finite — the skip predicate of the
        reference's AMP GradScaler (morpheus.py:1404-1423: scaler.step skips
        the optimizer update when grads carry inf/NaN, which is what keeps a
        single pathological SDS/render sample from poisoning the whole state;
        observed on v5e: one non-finite virtual-step grad at epoch ~600 NaN'd
        params+opt_state+occ within a step before this guard existed)."""
        return jnp.all(jnp.array([jnp.all(jnp.isfinite(g))
                                  for g in jax.tree.leaves(grads)]))

    @staticmethod
    def _select_state(ok, new, old):
        """Per-leaf select between two pytrees (ok is a traced bool)."""
        return jax.tree.map(lambda a, b: jnp.where(ok, a, b), new, old)

    def _real_step_body(self, active_levels=None):
        curr = self.curr
        spec = self._spec_for_levels(active_levels)

        def real_step(state: TrainState, data, key, epoch):
            step = state.global_step
            lr = curr.learning_rate(epoch)
            max_level = curr.max_level(epoch)
            k_occ, k_loss, k_t = jax.random.split(key, 3)

            t_occ = jax.random.uniform(k_t)
            occ = self._maybe_update_occ(state.occ, state.params, k_occ, step,
                                         t_occ, spec)

            def loss_fn(params):
                loss, out = self._real_loss(params, data, occ, k_loss, epoch,
                                            max_level, spec)
                return loss, out

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            # fold in any carried virtual-step gradients (morpheus.py:1415-1424)
            grads = jax.tree.map(jnp.add, grads, state.pending_grads)
            zeros = jax.tree.map(jnp.zeros_like, state.pending_grads)
            if self.optim_name == "adan":
                opt_state, params = optim.adan_update(
                    state.opt_state, grads, state.params, lr, 0.0)
            else:
                opt_state, params = optim.adam_update(
                    state.opt_state, grads, state.params, lr, 0.0)
            # GradScaler-parity skip: a non-finite grad anywhere keeps the
            # whole update out (params AND optimizer moments), like the
            # reference's scaler.step; the carried grads are dropped too
            ok = self._grads_finite(grads)
            params = self._select_state(ok, params, state.params)
            opt_state = self._select_state(ok, opt_state, state.opt_state)
            return TrainState(params, opt_state, state.ema, occ,
                              step + 1, zeros), loss

        return real_step

    # ---- Zero123 SDS virtual steps ----

    def precompute_embeddings(self, guidance):
        """Per-keyframe CLIP embeddings + VAE latents of masked 256² frames
        (reference get_embeddings, morpheus.py:218-277)."""
        import cv2
        from ..guidance import zero123 as z123

        ds = self.dataset
        kf = np.arange(0, ds.num_frames, self.config["train"]["kf_every"])
        if (ds.num_frames - 1) not in kf:
            kf = np.concatenate([kf, [ds.num_frames - 1]])

        imgs = []
        for i in kf:
            m = (ds.masks[i] > 0.5).astype(np.float32)
            masked = ds.images[i] * m[..., None] + (1.0 - m[..., None])
            gsz = self.guidance_spec.image_size
            masked = cv2.resize(masked, (gsz, gsz),
                                interpolation=cv2.INTER_AREA).astype(np.float32)
            imgs.append(masked)
        imgs = jnp.asarray(np.stack(imgs))

        spec = self.guidance_spec
        # guidance is a jit ARGUMENT, not a closure: closed-over weights
        # become HLO constants — at the real checkpoint size that is ~1.5 GB
        # of constants in the serialized module, which remote-compile setups
        # reject outright
        embed = jax.jit(lambda g, im: (z123.clip_image_embed(g, im, spec),
                                       z123.vae_encode_mode(g, im, spec)))
        c_crossattn, c_concat = [], []
        for i in range(len(kf)):
            c, v = embed(guidance, imgs[i:i + 1])
            c_crossattn.append(c)
            c_concat.append(v)

        nearest = np.argmin(np.abs(kf[None, :] - np.arange(ds.num_frames)[:, None]),
                            axis=1)
        return {
            "kf": jnp.asarray(kf, jnp.int32),
            "nearest_kf": jnp.asarray(nearest, jnp.int32),   # frame -> kf slot
            "c_crossattn": jnp.concatenate(c_crossattn, 0),  # (K, 1, 768)
            "c_concat": jnp.concatenate(c_concat, 0),        # (K, 32, 32, 4)
            "ref_polars": jnp.asarray(ds.theta)[jnp.asarray(kf)],
            "ref_azimuths": jnp.asarray(ds.phi)[jnp.asarray(kf)],
            "ref_radii": jnp.asarray(ds.radius)[jnp.asarray(kf)],
        }

    def _virtual_loss(self, params, occ, key, epoch, max_level, sampler,
                      spec=None, guidance=None, embeddings=None):
        """Virtual-view SDS loss (reference train_step(real_view=False),
        morpheus.py:1147-1236 + get_virtual_view_loss :1044-1088)."""
        k_v, k_rest = jax.random.split(key)
        if self.curr.progressive_view:
            th_range, ph_range = self.curr.view_ranges(epoch)
            batch = sampler.sample(k_v, theta_range=th_range,
                                   phi_range=ph_range)
        else:
            batch = sampler.sample(k_v)
        return self.virtual_loss_from_batch(params, occ, k_rest, epoch,
                                            max_level, batch,
                                            sampler.H, sampler.W, spec=spec,
                                            guidance=guidance,
                                            embeddings=embeddings)

    def virtual_loss_from_batch(self, params, occ, key, epoch, max_level,
                                batch, H, W, spec=None, guidance=None,
                                embeddings=None):
        spec = spec or self.spec
        """SDS loss on one explicit virtual view (H*W rays + Δangles). Batch-
        explicit so the multi-chip path (parallel/sharding.py) can vmap it
        over a views axis sharded across devices. guidance/embeddings should
        come in as traced jit arguments (closure capture would bake the
        weights into the compiled module as constants)."""
        from ..guidance import zero123 as z123

        cfg = self.config
        tr, gd = cfg["train"], cfg["guidance"]
        emb = embeddings if embeddings is not None else self._embeddings
        g = guidance if guidance is not None else self.guidance
        k_shade, k_amb, k_bg, k_bgsel, k_r, k_sds, k_pick = \
            jax.random.split(key, 7)

        N = H * W

        # shading selection (morpheus.py:864-887)
        exp_ratio = jnp.asarray(epoch, jnp.float32) / self.curr.n_epochs
        albedo_phase = exp_ratio <= self.curr.albedo_iter_ratio
        u = jax.random.uniform(k_shade)
        shading_rand = jnp.where(u >= 1.0 - tr["textureless_ratio"],
                                 field.SHADING_TEXTURELESS,
                                 field.SHADING_LAMBERTIAN)
        shading_id = jnp.where(albedo_phase, field.SHADING_ALBEDO,
                               shading_rand)
        min_amb = tr["min_ambient_ratio"]
        ambient = jnp.where(albedo_phase, 1.0,
                            min_amb + (1.0 - min_amb) * jax.random.uniform(k_amb))

        # background color (morpheus.py:889-903): single random color or bg_net
        rand_bg = jnp.broadcast_to(jax.random.uniform(k_bg, (3,)), (N, 3))
        if cfg["model"]["bg_radius"] > 0:
            bg_net_col = field.background(params, spec, batch["rays_d"],
                                          batch["rays_t"], max_level)
            use_net = jax.random.uniform(k_bgsel) > 0.5
            bg_color = jnp.where(use_net, bg_net_col, rand_bg)
        else:
            bg_color = rand_bg

        def _render(params, occ, k_r, bg_color, ambient, shading_id,
                    max_level):
            return renderer.render_rays(
                params, spec, occ, k_r,
                batch["rays_o"], batch["rays_d"], batch["rays_t"],
                batch["rays_id"],
                self.rcfg, bg_color=bg_color, ambient_ratio=ambient,
                shading_id=shading_id, real_view=False, optimize_pose=False,
                max_level=max_level, train=True)

        # exact rematerialization of the virtual render: at the late-
        # curriculum operating point (scale 0.5 → 32,400 rays) the render
        # backward's saved activations plus the resident full-scale Zero123
        # weights (~5 GB f32) exceed v5e HBM (observed RESOURCE_EXHAUSTED at
        # the epoch-800 transition of the full-budget run); recomputing the
        # render forward during the backward trades one forward (~15% of the
        # SDS step) for the whole activation set. Bit-exact (remat replays
        # the same ops/keys).
        if cfg["tpu"].get("remat_virtual", True):
            _render = jax.checkpoint(_render)
        out = _render(params, occ, k_r, bg_color, ambient, shading_id,
                      max_level)

        pred = jnp.clip(out["image"].reshape(1, H, W, 3), 0.0, 1.0)
        gsz = self.guidance_spec.image_size
        pred256 = jax.image.resize(pred, (1, gsz, gsz, 3), "bilinear")

        # keyframe choice: nearest or frame 0 ('cur_or_one',
        # morpheus.py:1044-1079)
        slot_near = emb["nearest_kf"][batch["frame_idx"]]
        use_cur = jax.random.uniform(k_pick) > 0.5
        slot = jnp.where(use_cur, slot_near, 0)

        # Δangles wrt the chosen keyframe's reference view
        polar_t = batch["polar"][0] + emb["ref_polars"][slot_near]
        azim_t = batch["azimuth"][0] + emb["ref_azimuths"][slot_near]
        rad_t = batch["radius"][0] + emb["ref_radii"][slot_near]
        polar_k = polar_t - emb["ref_polars"][slot]
        azim_k = azim_t - emb["ref_azimuths"][slot]
        azim_k = jnp.where(azim_k > 180.0, azim_k - 360.0, azim_k)
        rad_k = rad_t - emb["ref_radii"][slot]

        gs = z123.angle_grad_scale(
            polar_k, azim_k, rad_k, emb["ref_polars"][slot],
            emb["ref_azimuths"][slot], emb["ref_radii"][slot],
            gd["zero123_grad_weight"])

        t_lo, t_hi = self.curr.sds_t_range(epoch)
        min_step = (t_lo * 1000).astype(jnp.int32)
        max_step = (t_hi * 1000).astype(jnp.int32)

        loss_sds, _, _, diag = z123.sds_loss(
            g, k_sds, pred256,
            emb["c_crossattn"][slot][None], emb["c_concat"][slot][None],
            polar_k, azim_k, rad_k, min_step, max_step,
            guidance_scale=gd["zero123_guidance_scale"], grad_scale=gs,
            spec=self.guidance_spec,
            remat=cfg["tpu"].get("remat_virtual", True))
        if cfg["exp"]["save_guidance"]:
            out["sds_diag"] = dict(diag, pred_rgb=pred256)

        ori_w, rgb_w, beta_w = self.curr.loss_weights(epoch)
        loss = loss_sds + self._reg_loss(params, out, ori_w, beta_w, epoch)
        if tr["normal_smooth_2d"] > 0 and "normal_image" in out:
            ni = out["normal_image"].reshape(H, W, 3)
            loss += tr["normal_smooth_2d"] * (
                jnp.mean((ni[1:] - ni[:-1]) ** 2)
                + jnp.mean((ni[:, 1:] - ni[:, :-1]) ** 2))
        return loss, out

    def _make_virtual_step(self, sampler, active_levels=None):
        curr = self.curr
        vf = self.config["train"]["virtual_freq"]
        spec = self._spec_for_levels(active_levels)
        # donate the train state (argnum 0 only — guidance/embeddings are
        # reused across steps): the output state aliases the input buffers,
        # halving state residency during the update. tpu.donate_state=false
        # opts out for callers that re-time one state (bench/profile).
        donate = (0,) if self.config["tpu"].get("donate_state", True) else ()

        @partial(jax.jit, donate_argnums=donate)
        def virtual_step(state: TrainState, guidance, embeddings, key, epoch):
            step = state.global_step
            lr = curr.learning_rate(epoch)
            max_level = curr.max_level(epoch)
            freeze = curr.freeze_deform(epoch)
            k_occ, k_loss, k_t = jax.random.split(key, 3)

            t_occ = jax.random.uniform(k_t)
            occ = self._maybe_update_occ(state.occ, state.params, k_occ, step,
                                         t_occ, spec)

            def loss_fn(params):
                loss, out = self._virtual_loss(params, occ, k_loss, epoch,
                                               max_level, sampler, spec,
                                               guidance=guidance,
                                               embeddings=embeddings)
                return loss, out.get("sds_diag", {})

            (loss, diag), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            grads = jax.tree.map(lambda a: a / vf, grads)
            # GradScaler-parity skip (see _grads_finite): a non-finite SDS
            # grad neither steps the optimizer nor enters the pending carry
            ok = self._grads_finite(grads)
            grads = self._select_state(
                ok, grads, jax.tree.map(jnp.zeros_like, grads))

            # freeze active: optimizer step now with deform groups frozen;
            # else: carry gradients into the next real step
            def apply_now(_):
                if self.optim_name == "adan":
                    os_, p_ = optim.adan_update(state.opt_state, grads,
                                                state.params, lr, 1.0)
                else:
                    os_, p_ = optim.adam_update(state.opt_state, grads,
                                                state.params, lr, 1.0)
                os_ = self._select_state(ok, os_, state.opt_state)
                p_ = self._select_state(ok, p_, state.params)
                return os_, p_, jax.tree.map(jnp.zeros_like, grads)

            def carry(_):
                return (state.opt_state, state.params,
                        jax.tree.map(jnp.add, state.pending_grads, grads))

            opt_state, params, pending = jax.lax.cond(freeze > 0.5, apply_now,
                                                      carry, None)
            return TrainState(params, opt_state, state.ema, occ, step + 1,
                              pending), loss, diag

        return virtual_step

    # ---- SDS guidance visualization (morpheus.py:1221-1225,
    #      zero123_utils.py:215-231) ----

    def _save_guidance_panels(self, diag: dict, step: int):
        import cv2
        from ..guidance import zero123 as z123
        if self._panel_fn is None:
            spec = self.guidance_spec
            self._panel_fn = jax.jit(
                lambda g, d: z123.guidance_panels(g, d["pred_rgb"], d, spec))
        t_val = int(np.asarray(diag["t"])[0])
        panel = np.asarray(self._panel_fn(self.guidance, diag)[0])
        path = os.path.join(self.workspace, "guidance",
                            f"{step:06d}_zero123_{t_val}.png")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        bgr = cv2.cvtColor((np.clip(panel, 0, 1) * 255).astype(np.uint8),
                           cv2.COLOR_RGB2BGR)
        cv2.imwrite(path, bgr)

    def _make_ema_step(self):
        decay = self.config["train"]["ema_decay"]

        @jax.jit
        def ema_step(state: TrainState):
            return state._replace(ema=optim.ema_update(state.ema, state.params,
                                                       decay))
        return ema_step

    # ---- epoch loop (reference train_one_epoch, morpheus.py:1377-1433) ----

    def _novel_view_scale(self) -> float:
        d = self.config["data"]
        return (d["novel_view_scale_final"] if self.epoch > 800
                else d["novel_view_scale"])

    def _active_levels(self) -> int | None:
        """Host-side mirror of the traced max_level schedule: the number of
        hash levels the curriculum has unlocked this epoch (exact — masked
        levels are zero-filled either way), used for static truncation."""
        if not self.curr.progressive_level:
            return None
        L = self.spec.grid.num_levels
        # mirror the traced f32 schedule bit-for-bit (curr.max_level +
        # hashgrid.encode's ceil) so the static truncation never zeroes a
        # level the traced mask expects active
        ratio = np.float32(self.epoch) / np.float32(self.curr.n_epochs)
        ml = np.minimum(np.float32(1.0),
                        np.float32(0.5) + np.float32(0.5) * ratio)
        active = int(np.ceil(ml * np.float32(L)))
        # quantize UP to the next even count: running with more static levels
        # than the traced mask needs is exact (the mask zero-fills them), and
        # it halves the number of jit variants a run compiles (~200 s each)
        active = min(L, active + (active & 1))
        return max(1, min(L, active))

    def _virtual_step_for_scale(self, scale: float, active_levels=None):
        key = f"virtual_{scale}_{active_levels}"
        if key not in self._jit_cache:
            sampler = data_lib.VirtualViewSampler(self.dataset, self.config,
                                                  scale)
            self._jit_cache[key] = self._make_virtual_step(sampler,
                                                           active_levels)
        return self._jit_cache[key]

    def _train_one_epoch_dp(self, n_iters: int):
        """Multi-chip epoch: real steps shard the ray batch over the mesh,
        virtual steps run one full SDS view per chip (grads pmean'd)."""
        from ..parallel import sharding

        tr = self.config["train"]
        if "dp_real" not in self._jit_cache:
            self._jit_cache["dp_real"] = sharding.make_sharded_real_step(
                self, self.mesh)
        real_step = self._jit_cache["dp_real"]
        use_sds = self.guidance is not None
        vstep = vsampler = None
        if use_sds:
            vkey = f"dp_virtual_{self._novel_view_scale()}"
            if vkey not in self._jit_cache:
                self._jit_cache[vkey] = sharding.make_sharded_virtual_step(
                    self, self.mesh, self._novel_view_scale())
            vstep, vsampler = self._jit_cache[vkey]

        epoch = jnp.asarray(self.epoch, jnp.float32)
        loss = jnp.nan
        host_step = getattr(self, "_host_step", 0)
        nf = self.dataset.num_frames
        for _ in range(n_iters):
            for _ in range(tr["virtual_freq"]):
                self.key, k = jax.random.split(self.key)
                if use_sds and host_step >= tr["warm_up_steps"]:
                    self.key, kb = jax.random.split(self.key)
                    vb = sharding.sample_virtual_batch(vsampler, kb, self.dp)
                    vb = sharding.shard_batch(vb, self.mesh)
                    self.state, loss, diag = vstep(self.state, self.guidance,
                                                   self._embeddings, vb, k,
                                                   epoch)
                    exp = self.config["exp"]
                    if (exp["save_guidance"] and diag
                            and host_step % exp["save_guide_intervel"] == 0
                            and self.workspace):
                        # device 0's view only (diag is view-concatenated)
                        d0 = jax.tree.map(lambda x: x[:1], diag)
                        self._save_guidance_panels(d0, host_step)
                else:
                    batch, bg = sharding.host_sample_real_batch(
                        self._np_rng, self.data, nf, tr["real_ray_num"])
                    batch = sharding.shard_batch(batch, self.mesh)
                    bg = sharding.shard_batch({"bg": bg}, self.mesh)["bg"]
                    self.state, loss = real_step(self.state, batch, bg, k,
                                                 epoch)
                host_step += 1
            chain = (int(tr["real_freq"])
                     if self.config["tpu"].get("chain_steps", True) else 0)
            if chain > 1:
                # one scan dispatch over real_freq host-sampled batches (same
                # key-split sequence as the loop below; see
                # sharding.make_sharded_real_steps_chained)
                ckey = f"dp_real_chain_{chain}"
                if ckey not in self._jit_cache:
                    self._jit_cache[ckey] = \
                        sharding.make_sharded_real_steps_chained(
                            self, self.mesh, chain)
                pairs = [sharding.host_sample_real_batch(
                    self._np_rng, self.data, nf, tr["real_ray_num"])
                    for _ in range(chain)]
                batches = jax.tree.map(lambda *xs: np.stack(xs),
                                       *[p[0] for p in pairs])
                bgs = np.stack([p[1] for p in pairs])
                batches = sharding.shard_batch_stacked(batches, self.mesh)
                bgs = sharding.shard_batch_stacked({"bg": bgs},
                                                   self.mesh)["bg"]
                self.state, self.key, loss = self._jit_cache[ckey](
                    self.state, batches, bgs, self.key, epoch)
                host_step += chain
            else:
                for _ in range(tr["real_freq"]):
                    self.key, k = jax.random.split(self.key)
                    batch, bg = sharding.host_sample_real_batch(
                        self._np_rng, self.data, nf, tr["real_ray_num"])
                    batch = sharding.shard_batch(batch, self.mesh)
                    bg = sharding.shard_batch({"bg": bg}, self.mesh)["bg"]
                    self.state, loss = real_step(self.state, batch, bg, k,
                                                 epoch)
                    host_step += 1
        self._host_step = host_step
        if "ema" not in self._jit_cache:
            self._jit_cache["ema"] = self._make_ema_step()
        self.state = self._jit_cache["ema"](self.state)
        return float(loss)

    def _evict_stale_variants(self, keep: set):
        """Drop jitted step variants for curriculum points the run has moved
        past (superseded active-level sets / novel-view scales). A loaded TPU
        executable holds HBM for its program and any captured buffers for as
        long as we keep a reference; with the full-scale Zero123 weights
        (~5 GB f32) resident on a 16 GB v5e, dead variants are headroom the
        epoch-800 scale transition needs (observed RESOURCE_EXHAUSTED there
        on the full-budget run)."""
        import gc
        dropped = False
        for k in list(self._jit_cache):
            if k in keep:
                continue
            if k.startswith(("real_", "virtual_", "dp_virtual_")):
                del self._jit_cache[k]
                dropped = True
        if dropped:
            # the PjitFunction holds its loaded executables until collected;
            # force the collection so the HBM comes back BEFORE the next
            # variant compiles (curriculum transitions compile while the old
            # variant would otherwise still be loaded)
            gc.collect()

    def train_one_epoch(self, n_iters: int | None = None):
        tr = self.config["train"]
        n_iters = n_iters or tr.get("n_iters", 10)
        if self.dp > 1:
            return self._train_one_epoch_dp(n_iters)
        al = self._active_levels()
        rkey = f"real_{al}"
        self._evict_stale_variants(
            {rkey, f"real_chain_{al}_{int(tr['real_freq'])}",
             f"virtual_{self._novel_view_scale()}_{al}"})
        if rkey not in self._jit_cache:
            self._jit_cache[rkey] = self._make_real_step(al)
        if "ema" not in self._jit_cache:
            self._jit_cache["ema"] = self._make_ema_step()
        real_step = self._jit_cache[rkey]
        chain = (int(tr["real_freq"]) if self.config["tpu"].get("chain_steps",
                                                                True) else 0)
        real_chain = None
        if chain > 1:
            ckey = f"real_chain_{al}_{chain}"
            if ckey not in self._jit_cache:
                self._jit_cache[ckey] = self._make_real_steps_chained(al,
                                                                      chain)
            real_chain = self._jit_cache[ckey]
        use_sds = self.guidance is not None
        virtual_step = (self._virtual_step_for_scale(self._novel_view_scale(),
                                                     al)
                        if use_sds else None)
        epoch = jnp.asarray(self.epoch, jnp.float32)
        loss = jnp.nan
        host_step = getattr(self, "_host_step", 0)
        exp = self.config["exp"]
        for _ in range(n_iters):
            for _ in range(tr["virtual_freq"]):
                self.key, k = jax.random.split(self.key)
                # warm-up forces real views (morpheus.py:1174-1175)
                if use_sds and host_step >= tr["warm_up_steps"]:
                    self.state, loss, diag = virtual_step(
                        self.state, self.guidance, self._embeddings, k, epoch)
                    if (exp["save_guidance"] and diag
                            and host_step % exp["save_guide_intervel"] == 0
                            and self.workspace):
                        self._save_guidance_panels(diag, host_step)
                else:
                    self.state, loss = real_step(self.state, k, epoch)
                host_step += 1
            if real_chain is not None:
                self.state, self.key, loss = real_chain(self.state, self.key,
                                                        epoch)
                host_step += chain
            else:
                for _ in range(tr["real_freq"]):
                    self.key, k = jax.random.split(self.key)
                    self.state, loss = real_step(self.state, k, epoch)
                    host_step += 1
        self._host_step = host_step
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
            # RNG key + host step so a resumed run replays identically
            "key": np.asarray(self.key),
            "host_step": getattr(self, "_host_step", 0),
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)

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
            global_step=jnp.asarray(st["global_step"]),
            pending_grads=jax.tree.map(
                jnp.asarray, st.get("pending_grads")) if st.get("pending_grads")
            is not None else jax.tree.map(jnp.zeros_like, st["params"]))
        self.epoch = payload["epoch"]
        if "key" in payload:
            self.key = jnp.asarray(payload["key"])
        if "host_step" in payload:
            self._host_step = payload["host_step"]
