"""Full SDS pipeline test with a tiny random-weight Zero123 (CPU):
virtual + real steps interleave with the reference's freeze semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morpheus_tpu.config import merge_defaults
from morpheus_tpu.data import dataset as data_lib
from morpheus_tpu.data.synthetic import make_synthetic_scene
from morpheus_tpu.guidance import zero123 as z123
from morpheus_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_spec():
    return z123.Zero123Spec(image_size=64, unet_channels=32, unet_mult=(1, 2),
                            unet_heads=4, context_dim=32, clip_width=64,
                            clip_layers=2, clip_heads=4, clip_patch=14)


@pytest.fixture(scope="module")
def tiny_guidance(tiny_spec):
    return z123.Zero123Guidance.init_random(jax.random.PRNGKey(0), tiny_spec)


@pytest.fixture(scope="module")
def sds_trainer(tiny_spec, tiny_guidance):
    cfg = merge_defaults({
        "data": {"data_dir": "<synthetic>", "novel_view_scale": 0.5},
        "exp": {"seed": 0},
        "train": {"n_epochs": 20, "warm_up_end": 4, "warm_up_steps": 2,
                  "real_ray_num": 64, "real_freq": 1, "virtual_freq": 1,
                  "n_iters": 1, "freeze_epoch": 5, "kf_every": 2,
                  "normal_smoothness": 0.0, "normal_smooth_3d": 0.0},
        "model": {"bg_radius": 1.4, "grid_num_levels": 4,
                  "grid_log2_hashmap_size": 10, "grid_desired_resolution": 32},
        "render": {"step_size": 0.04},
        "tpu": {"max_samples_per_ray": 16, "march_steps": 64,
                "occ_resolution": 16, "occ_warmup_steps": 8,
                "occ_update_every": 4},
    })
    scene = make_synthetic_scene(num_frames=4, H=32, W=32)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    return Trainer(cfg, ds, guidance=tiny_guidance, guidance_spec=tiny_spec)


def test_embeddings_precomputed(sds_trainer):
    emb = sds_trainer._embeddings
    # kf_every=2 over 4 frames -> kf [0, 2, 3]
    np.testing.assert_array_equal(np.asarray(emb["kf"]), [0, 2, 3])
    assert emb["c_crossattn"].shape == (3, 1, 32)
    assert emb["c_concat"].shape == (3, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(emb["nearest_kf"]), [0, 0, 1, 2])


def test_sds_training_steps_run(sds_trainer):
    tr = sds_trainer
    losses = []
    for ep in [1, 2, 6, 7]:   # spans warmup, freeze-on and freeze-off epochs
        tr.epoch = ep
        losses.append(tr.train_one_epoch())
    assert all(np.isfinite(l) for l in losses), losses


def test_sds_loss_gradient_flows(tiny_spec, tiny_guidance):
    g = tiny_guidance
    key = jax.random.PRNGKey(1)
    img = jax.random.uniform(key, (1, 64, 64, 3))
    cc = jax.random.normal(key, (1, 1, 32))
    cv = jax.random.normal(key, (1, 8, 8, 4))

    def f(im):
        loss, t, noise, _ = z123.sds_loss(
            g, jax.random.PRNGKey(2), im, cc, cv,
            jnp.asarray(30.0), jnp.asarray(10.0), jnp.asarray(0.0),
            jnp.asarray(20), jnp.asarray(500), grad_scale=1.0, spec=tiny_spec)
        return loss

    gr = jax.grad(f)(img)
    assert np.all(np.isfinite(np.asarray(gr)))
    assert float(jnp.abs(gr).sum()) > 0


def test_sds_moves_geometry_toward_target(tiny_spec, tiny_guidance,
                                          monkeypatch):
    """SDS efficacy end-to-end: with an ε-predictor constructed as the ideal
    score of a point mass at a known target latent,
        ε̂(x_t, t) = (x_t − √ᾱ_t·z*) / √(1−ᾱ_t)   ⇒   ε̂−ε ∝ (z − z*),
    a few dozen virtual steps must pull the rendered novel views' latents
    (and pixels) toward the target — proving the full plumbing (render →
    resize → encode → noise → CFG UNet → SDS grad → optimizer) actually
    reshapes the field, not just produces finite grads. Mirrors the role of
    the reference's guidance (zero123_utils.py:138-236).

    The encode is patched to a TRANSPARENT linear map (average-pool +
    luminance channel) instead of the random-weight VAE: a random encoder's
    posterior std is ~1 (70% of the sampled latent is noise) and its
    non-injective latent geometry admits optima far from the target image in
    pixel space — measured: latents initially converge then drift while
    pixels regress, i.e. the assertion would test the random encoder, not
    the SDS plumbing. The real VAE's numerics are covered by the torch
    parity tests (test_guidance_parity.py); with the linear encode this test
    isolates exactly the gradient chain SDS must drive. Measured here:
    latent dist 10.3 -> ~2.0 and pixel MSE 0.35 -> ~0.10 in 60 virtual
    steps."""
    cfg = merge_defaults({
        "data": {"data_dir": "<synthetic>", "novel_view_scale": 0.5},
        "exp": {"seed": 0, "save_guidance": False},
        "train": {"n_epochs": 40, "warm_up_end": 4, "warm_up_steps": 0,
                  "real_ray_num": 64, "real_freq": 0, "virtual_freq": 1,
                  "n_iters": 1, "freeze_epoch": 1000, "kf_every": 2,
                  "normal_smoothness": 0.0, "normal_smooth_3d": 0.0,
                  "lr": 0.01},
        "model": {"bg_radius": 0.0, "grid_num_levels": 4,
                  "grid_log2_hashmap_size": 10, "grid_desired_resolution": 32},
        "guidance": {"zero123_grad_weight": 2.0},
        "render": {"step_size": 0.04},
        "tpu": {"max_samples_per_ray": 16, "march_steps": 64,
                "occ_resolution": 16, "occ_warmup_steps": 8,
                "occ_update_every": 4},
    })
    scene = make_synthetic_scene(num_frames=4, H=32, W=32)
    ds = data_lib.DeformDataset(cfg, scene=scene)

    # transparent linear "VAE": average-pool to latent res, 4th channel =
    # luminance, in [-1, 1] like the real encoder's moments
    S = tiny_spec.image_size
    LAT = S // 8

    def lin_mode(g, img, spec=None):
        x = jax.image.resize(img, (img.shape[0], LAT, LAT, 3), "bilinear")
        return jnp.concatenate([x, x.mean(-1, keepdims=True)], -1) * 2.0 - 1.0

    monkeypatch.setattr(z123, "vae_encode_mode", lin_mode)
    monkeypatch.setattr(
        z123, "vae_encode_sample",
        lambda g, key, img, spec=None:
        tiny_spec.scale_factor * lin_mode(g, img))

    # target: a large dark disk on white — clearly different from the small
    # geo-init sphere the field starts as
    yy, xx = np.mgrid[0:S, 0:S]
    disk = ((yy - S / 2) ** 2 + (xx - S / 2) ** 2) < (0.42 * S) ** 2
    target = np.where(disk[..., None], 0.2, 1.0).astype(np.float32)
    target = np.broadcast_to(target, (S, S, 3))
    target = jnp.asarray(target)[None]                       # (1, S, S, 3)
    z_target = tiny_spec.scale_factor * z123.vae_encode_mode(
        tiny_guidance, target, tiny_spec)                    # (1, 8, 8, 4)

    def ideal_unet(g, x, t, context, spec=None):
        ac = g.alphas_cumprod[t].reshape(-1, 1, 1, 1)
        zt = jnp.broadcast_to(z_target, (x.shape[0],) + z_target.shape[1:])
        return (x[..., :4] - jnp.sqrt(ac) * zt) / jnp.sqrt(1.0 - ac)

    monkeypatch.setattr(z123, "apply_unet", ideal_unet)
    tr = Trainer(cfg, ds, guidance=tiny_guidance, guidance_spec=tiny_spec)

    def latent_dist(trainer):
        """||scale·encode(render of a fixed novel view) − z*||² (jitted parts
        reuse the step's own functions)."""
        from morpheus_tpu import renderer as rend
        from morpheus_tpu.model import field
        sampler = data_lib.VirtualViewSampler(ds, cfg, 0.5)
        batch = sampler.sample(jax.random.PRNGKey(123))
        N = sampler.H * sampler.W
        out = rend.render_rays(
            trainer.state.params, trainer.spec, trainer.state.occ,
            jax.random.PRNGKey(7), batch["rays_o"], batch["rays_d"],
            batch["rays_t"], batch["rays_id"], trainer.rcfg,
            bg_color=jnp.ones((N, 3)), ambient_ratio=1.0,
            shading_id=field.SHADING_ALBEDO, real_view=False, train=False)
        img = jnp.clip(out["image"].reshape(1, sampler.H, sampler.W, 3), 0, 1)
        img = jax.image.resize(img, (1, S, S, 3), "bilinear")
        z = tiny_spec.scale_factor * z123.vae_encode_mode(tiny_guidance, img,
                                                          tiny_spec)
        pix = float(jnp.mean((img - target) ** 2))
        return float(jnp.sum((z - z_target) ** 2)), pix

    d0, p0 = latent_dist(tr)
    for _ in range(4):
        tr.epoch = 1                      # albedo phase, freeze active
        tr.train_one_epoch(n_iters=15)
    d1, p1 = latent_dist(tr)
    assert np.isfinite(d1)
    assert d1 < 0.5 * d0, (d0, d1)        # latents pulled toward the target
    assert p1 < p0, (p0, p1)              # pixels too


def test_sds_gradient_through_real_vae_encoder(tiny_spec, tiny_guidance,
                                               monkeypatch):
    """SDS efficacy THROUGH the real conv VAE encoder (VERDICT r2 #6): only
    apply_unet is idealized (point-mass score at a target latent); the
    differentiable path render → resize → REAL conv encode stays intact —
    this is the actual gradient chain of the reference's SDS
    (zero123_utils.py:157-158: the VAE encode carries the SDS gradient).
    vae_encode_sample is made deterministic (posterior mean, real conv) so
    the check isn't dominated by the random-init VAE's ~1-std posterior
    noise; the encoder Jacobian the gradient flows through is unchanged.

    With the ideal ε̂ the construction is exact: ε̂ − ε =
    √ac/√(1−ac)·(z − z_target) — the sampled noise cancels — so the SDS
    gradient IS c(t)·∇‖z − z_target‖² with c > 0. Two assertions:
    (a) image level: ∇_img sds_loss is parallel (cos > 0.999) to
        ∇_img ‖sf·encode(img) − z_target‖² — the conv-encoder VJP chain
        inside the production sds_loss;
    (b) field level: one explicit small gradient step of the production
        virtual loss (trainer.virtual_loss_from_batch on a FIXED batch/key,
        regularizer weights zeroed) strictly decreases the latent distance
        of that same rendered view, re-measured through the same chain.
    An N-step Adam optimization is deliberately NOT asserted here: with a
    random-init encoder the latent geometry is ill-conditioned and Adam's
    normalized steps overshoot — the descent property at small step size is
    the sound invariant (the linear-encode test above covers the long-run
    trainer dynamics)."""
    cfg = merge_defaults({
        "data": {"data_dir": "<synthetic>", "novel_view_scale": 0.5},
        "exp": {"seed": 0, "save_guidance": False},
        "train": {"n_epochs": 40, "warm_up_end": 4, "warm_up_steps": 0,
                  "real_ray_num": 64, "real_freq": 0, "virtual_freq": 1,
                  "n_iters": 1, "freeze_epoch": 1000, "kf_every": 2,
                  "normal_smoothness": 0.0, "normal_smooth_3d": 0.0,
                  "ori_weight": 0.0, "beta_weight": 0.0, "code_reg": 0.0},
        "model": {"bg_radius": 0.0, "grid_num_levels": 4,
                  "grid_log2_hashmap_size": 10, "grid_desired_resolution": 32},
        "guidance": {"zero123_grad_weight": 2.0},
        "render": {"step_size": 0.04},
        "tpu": {"max_samples_per_ray": 16, "march_steps": 64,
                "occ_resolution": 16, "occ_warmup_steps": 8,
                "occ_update_every": 4},
    })
    scene = make_synthetic_scene(num_frames=4, H=32, W=32)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    S = tiny_spec.image_size
    sf = tiny_spec.scale_factor

    real_encode_mode = z123.vae_encode_mode  # bind before patching
    zs = []   # stash: eager (non-jit) forwards append the CONCRETE latent

    def det_encode(g, key, img, spec=None):
        z = sf * real_encode_mode(g, img, spec or tiny_spec)
        zs.append(z)
        return z

    monkeypatch.setattr(z123, "vae_encode_sample", det_encode)

    # target latent: the real conv encode of a large dark disk on white
    yy, xx = np.mgrid[0:S, 0:S]
    disk = ((yy - S / 2) ** 2 + (xx - S / 2) ** 2) < (0.42 * S) ** 2
    target = np.where(disk[..., None], 0.2, 1.0).astype(np.float32)
    target = jnp.asarray(np.broadcast_to(target, (S, S, 3)))[None]
    z_target = sf * real_encode_mode(tiny_guidance, target, tiny_spec)

    def ideal_unet(g, x, t, context, spec=None):
        ac = g.alphas_cumprod[t].reshape(-1, 1, 1, 1)
        zt = jnp.broadcast_to(z_target, (x.shape[0],) + z_target.shape[1:])
        return (x[..., :4] - jnp.sqrt(ac) * zt) / jnp.sqrt(1.0 - ac)

    monkeypatch.setattr(z123, "apply_unet", ideal_unet)
    tr = Trainer(cfg, ds, guidance=tiny_guidance, guidance_spec=tiny_spec)

    # ---- (a) production sds_loss image-gradient ∥ latent-distance gradient
    img0 = jax.random.uniform(jax.random.PRNGKey(9), (1, S, S, 3))
    cc = jnp.zeros((1, 1, tiny_spec.context_dim))
    lat_hw = z_target.shape[1]
    cv = jnp.zeros((1, lat_hw, lat_hw, 4))

    def f_sds(im):
        loss, _, _, _ = z123.sds_loss(
            tiny_guidance, jax.random.PRNGKey(3), im, cc, cv,
            jnp.asarray(10.0), jnp.asarray(20.0), jnp.asarray(0.0),
            jnp.asarray(500), jnp.asarray(500), grad_scale=1.0,
            spec=tiny_spec)
        return loss

    def f_dist(im):
        z = sf * real_encode_mode(tiny_guidance, im, tiny_spec)
        return jnp.sum((z - z_target) ** 2)

    g1 = np.asarray(jax.grad(f_sds)(img0)).ravel()
    g2 = np.asarray(jax.grad(f_dist)(img0)).ravel()
    cos = float(g1 @ g2 / (np.linalg.norm(g1) * np.linalg.norm(g2)))
    assert cos > 0.999, cos

    # ---- (b) small-step descent through the full production virtual loss
    sampler = data_lib.VirtualViewSampler(ds, cfg, 0.5)
    batch = sampler.sample(jax.random.PRNGKey(123))
    KEY = jax.random.PRNGKey(7)
    occ = tr.state.occ

    def loss_fn(params):
        loss, _ = tr.virtual_loss_from_batch(
            params, occ, KEY, 1.0, None, batch, sampler.H, sampler.W)
        return loss

    def dist_at(params):
        zs.clear()
        loss_fn(params)             # eager: det_encode stashes the latent
        assert zs, "vae_encode_sample not reached"
        return float(jnp.sum((zs[0] - z_target) ** 2))

    d0 = dist_at(tr.state.params)
    grads = jax.grad(loss_fn)(tr.state.params)
    zs.clear()
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                               for g in jax.tree.leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0
    descended = []
    for eta in [3e-3, 1e-3, 3e-4, 1e-4]:
        p_new = jax.tree.map(lambda p, g: p - (eta / gnorm) * g,
                             tr.state.params, grads)
        descended.append(dist_at(p_new))
    # a descent direction must reduce the latent distance at SOME small step
    assert min(descended) < d0 * (1.0 - 1e-4), (d0, descended)


def test_angle_grad_scale_zero_at_reference_view():
    s = z123.angle_grad_scale(jnp.asarray(0.0), jnp.asarray(0.0),
                              jnp.asarray(0.0), 90.0, 0.0, 3.0, 1.0)
    assert abs(float(s)) < 1e-5
    s2 = z123.angle_grad_scale(jnp.asarray(0.0), jnp.asarray(180.0),
                               jnp.asarray(0.0), 90.0, 0.0, 3.0, 1.0)
    # opposite azimuth: angle 180 deg -> scale = e - 1
    np.testing.assert_allclose(float(s2), np.e - 1.0, rtol=1e-4)


def test_novel_view_sampler_runs(tiny_spec, tiny_guidance):
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    out = z123.novel_view_sample(tiny_guidance, jax.random.PRNGKey(4), img,
                                 polar=10.0, azimuth=30.0, ddim_steps=3,
                                 spec=tiny_spec)
    assert out.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_save_guidance_panels_written(tiny_spec, tiny_guidance, tmp_path):
    """save_guidance writes render/noised/denoised/grad panel PNGs every
    save_guide_intervel steps (morpheus.py:1221-1225)."""
    import glob
    import os
    cfg = merge_defaults({
        "data": {"data_dir": "<synthetic>", "novel_view_scale": 0.5},
        "exp": {"seed": 0, "save_guidance": True, "save_guide_intervel": 1,
                "output": str(tmp_path), "exp_name": "guid"},
        "train": {"n_epochs": 20, "warm_up_end": 4, "warm_up_steps": 0,
                  "real_ray_num": 64, "real_freq": 1, "virtual_freq": 1,
                  "n_iters": 1, "freeze_epoch": 5, "kf_every": 2,
                  "normal_smoothness": 0.0, "normal_smooth_3d": 0.0},
        "model": {"bg_radius": 0.0, "grid_num_levels": 4,
                  "grid_log2_hashmap_size": 10, "grid_desired_resolution": 32},
        "render": {"step_size": 0.04},
        "tpu": {"max_samples_per_ray": 16, "march_steps": 64,
                "occ_resolution": 16, "occ_warmup_steps": 8,
                "occ_update_every": 4},
    })
    scene = make_synthetic_scene(num_frames=4, H=32, W=32)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    tr = Trainer(cfg, ds, guidance=tiny_guidance, guidance_spec=tiny_spec)
    tr.epoch = 1
    tr.train_one_epoch()
    pngs = glob.glob(os.path.join(tr.workspace, "guidance", "*_zero123_*.png"))
    assert pngs, "no guidance panels written"
    import cv2
    img = cv2.imread(pngs[0])
    S = tiny_spec.image_size
    assert img.shape == (S, 4 * S, 3), img.shape  # 4 tiles side by side


def test_unet_bf16_compute_matches_f32(tiny_spec, tiny_guidance):
    """guidance.compute_dtype=bfloat16 (the reference's fp16-autocast/vram_O
    analogue) must reproduce the f32 ε-prediction within bf16 tolerance —
    the UNet is frozen/stop-gradient'd, so only ε̂ precision changes."""
    import dataclasses
    spec16 = dataclasses.replace(tiny_spec, compute_dtype="bfloat16")
    lat = tiny_spec.image_size // 8
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (2, lat, lat, 8))
    t = jnp.asarray([17, 400], jnp.int32)
    ctx = jax.random.normal(jax.random.fold_in(key, 1),
                            (2, 1, tiny_spec.context_dim))
    e32 = z123.apply_unet(tiny_guidance, x, t, ctx, tiny_spec)
    e16 = z123.apply_unet(tiny_guidance, x, t, ctx, spec16)
    assert e16.dtype == jnp.float32
    # bf16 has ~3 decimal digits; activations are O(1)
    np.testing.assert_allclose(np.asarray(e16), np.asarray(e32),
                               rtol=0.1, atol=0.08)
    # and it must still be finite/stable at the real timestep extremes
    t2 = jnp.asarray([0, tiny_spec.num_train_timesteps - 1], jnp.int32)
    assert bool(jnp.all(jnp.isfinite(
        z123.apply_unet(tiny_guidance, x, t2, ctx, spec16))))
