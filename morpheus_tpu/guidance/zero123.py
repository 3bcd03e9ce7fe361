"""Zero-1-to-3 score-distillation guidance
(reference: models/guidance/zero123_utils.py).

Holds the frozen LatentDiffusion pieces as one param pytree (UNet + VAE +
CLIP image tower + cc_projection) and exposes pure functions so the SDS step
jits into the virtual-view train step. The UNet forward runs under
stop_gradient (the reference wraps it in no_grad, zero123_utils.py:177) —
SDS needs no UNet backward.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import clip_vit, schedule, unet, vae


@dataclasses.dataclass(frozen=True)
class Zero123Spec:
    num_train_timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.012
    scale_factor: float = 0.18215
    guidance_scale: float = 5.0
    image_size: int = 256
    # architecture (defaults = the real Zero123 sizes; tests shrink these)
    unet_channels: int = 320
    unet_mult: tuple = (1, 2, 4, 4)
    unet_heads: int = 8
    context_dim: int = 768
    clip_width: int = 1024
    clip_layers: int = 24
    clip_heads: int = 16
    clip_patch: int = 14
    vae_ch: int = 128
    # VAE depth (tests shrink these; real Zero123 = (1,2,4,4) x 2 blocks).
    # Latent side = image_size / 2^(len(vae_mult)-1).
    vae_mult: tuple = (1, 2, 4, 4)
    vae_res_blocks: int = 2
    # UNet compute dtype (guidance.compute_dtype). 'bfloat16' casts the frozen
    # UNet's params + activations for the ε-prediction only — the analogue of
    # the reference's fp16 autocast over the LDM forward (zero123_utils.py
    # vram_O / torch.cuda.amp); the UNet is under stop_gradient so SDS
    # gradients are unaffected except through the (fp16-equivalent) ε̂ values.
    # The differentiable VAE/render path stays f32.
    compute_dtype: str = "float32"

    @property
    def diffusion(self) -> schedule.DiffusionSchedule:
        return schedule.DiffusionSchedule(self.num_train_timesteps,
                                          self.linear_start, self.linear_end)

    @staticmethod
    def from_ldm_config(path: str) -> "Zero123Spec":
        """Build the spec from the reference's OmegaConf model yaml
        (guidance.zero123_config; the reference reads timesteps/linear_start/
        linear_end from it, zero123_utils.py:68-81). Architecture fields fall
        back to the Zero123 defaults when absent."""
        import yaml
        with open(path, "r") as f:
            cfg = yaml.safe_load(f)
        p = cfg["model"]["params"]
        unet = p.get("unet_config", {}).get("params", {})
        vae_dd = (p.get("first_stage_config", {}).get("params", {})
                  .get("ddconfig", {}))
        return Zero123Spec(
            num_train_timesteps=int(p.get("timesteps", 1000)),
            linear_start=float(p.get("linear_start", 0.00085)),
            linear_end=float(p.get("linear_end", 0.012)),
            scale_factor=float(p.get("scale_factor", 0.18215)),
            image_size=int(vae_dd.get("resolution", 256)),
            unet_channels=int(unet.get("model_channels", 320)),
            unet_mult=tuple(unet.get("channel_mult", (1, 2, 4, 4))),
            unet_heads=int(unet.get("num_heads", 8)),
            context_dim=int(unet.get("context_dim", 768)),
            vae_ch=int(vae_dd.get("ch", 128)))

    def unet_module(self):
        return unet.UNetModel(model_channels=self.unet_channels,
                              channel_mult=self.unet_mult,
                              num_heads=self.unet_heads,
                              context_dim=self.context_dim)

    def clip_module(self):
        return clip_vit.CLIPVisionTransformer(
            width=self.clip_width, layers=self.clip_layers,
            heads=self.clip_heads, patch=self.clip_patch,
            out_dim=self.context_dim)

    def vae_module(self):
        return vae.AutoencoderKL(ch=self.vae_ch, ch_mult=self.vae_mult,
                                 num_res_blocks=self.vae_res_blocks)


class Zero123Guidance(NamedTuple):
    """Frozen parameters + static spec (treat as a pytree of arrays)."""
    unet_params: Any
    vae_params: Any
    clip_params: Any
    cc_w: jnp.ndarray      # (772, 768)  cc_projection (ddpm.py:526-529)
    cc_b: jnp.ndarray      # (768,)
    alphas_cumprod: jnp.ndarray  # (T,)

    @staticmethod
    def init_random(key: jax.Array,
                    spec: Zero123Spec = Zero123Spec()) -> "Zero123Guidance":
        """Random-weight instance (architecture tests / no-checkpoint runs)."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        lat = spec.image_size // 8
        cd = spec.context_dim
        unet_params = spec.unet_module().init(
            k1, jnp.zeros((1, lat, lat, 8)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 1, cd)))["params"]
        vae_params = spec.vae_module().init(
            k2, jnp.zeros((1, spec.image_size, spec.image_size, 3)))["params"]
        clip_params = spec.clip_module().init(
            k3, jnp.zeros((1, 224, 224, 3)))["params"]
        cc_w = 0.02 * jax.random.normal(k4, (cd + 4, cd))
        # reference initializes cc_projection near identity on the CLIP part
        cc_w = cc_w.at[:cd, :].add(jnp.eye(cd))
        return Zero123Guidance(
            unet_params=unet_params, vae_params=vae_params,
            clip_params=clip_params, cc_w=cc_w, cc_b=jnp.zeros((cd,)),
            alphas_cumprod=jnp.asarray(spec.diffusion.alphas_cumprod,
                                       jnp.float32))

    @staticmethod
    def from_checkpoint(path: str, t_range=(0.02, 0.5),
                        spec: Zero123Spec = Zero123Spec()) -> "Zero123Guidance":
        from .convert import load_zero123_checkpoint
        return load_zero123_checkpoint(path, spec)


# ---- model wrappers ----------------------------------------------------------

def clip_image_embed(g: Zero123Guidance, images: jnp.ndarray,
                     spec: Zero123Spec = Zero123Spec()) -> jnp.ndarray:
    """images (B, H, W, 3) in [0, 1] → (B, 1, 768). Reference feeds images in
    [-1, 1] to FrozenCLIPImageEmbedder which rescales to [0, 1] internally
    (modules.py:366-371); the net effect is CLIP-normalized [0, 1] input."""
    x = clip_vit.preprocess(images)
    emb = spec.clip_module().apply({"params": g.clip_params}, x)
    return emb[:, None, :]


def vae_encode_mode(g: Zero123Guidance, images01: jnp.ndarray,
                    spec: Zero123Spec = Zero123Spec()) -> jnp.ndarray:
    """Unscaled latent mode for c_concat (zero123_utils.py:96)."""
    x = images01 * 2.0 - 1.0
    return spec.vae_module().apply({"params": g.vae_params}, x,
                                   method=vae.AutoencoderKL.encode_moments)[0]


def vae_encode_sample(g: Zero123Guidance, key: jax.Array,
                      images01: jnp.ndarray,
                      spec: Zero123Spec = Zero123Spec()) -> jnp.ndarray:
    """Scaled posterior sample for SDS latents (encode_imgs,
    zero123_utils.py:285-290 → ddpm.get_first_stage_encoding)."""
    x = images01 * 2.0 - 1.0
    mean, logvar = spec.vae_module().apply(
        {"params": g.vae_params}, x, method=vae.AutoencoderKL.encode_moments)
    std = jnp.exp(0.5 * logvar)
    z = mean + std * jax.random.normal(key, mean.shape)
    return spec.scale_factor * z


def vae_decode(g: Zero123Guidance, latents: jnp.ndarray,
               spec: Zero123Spec = Zero123Spec()) -> jnp.ndarray:
    """latents → images in [0, 1] (decode_latents, zero123_utils.py:277-283)."""
    z = latents / spec.scale_factor
    img = spec.vae_module().apply({"params": g.vae_params}, z,
                                  method=vae.AutoencoderKL.decode)
    return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)


def cast_for_compute(g: Zero123Guidance,
                     spec: Zero123Spec) -> Zero123Guidance:
    """One-time cast of the frozen UNet tree to spec.compute_dtype. Call at
    guidance construction: dtypes are static at trace time, so after this the
    in-jit cast in apply_unet is elided — without it the full ~3.5 GB f32
    UNet tree would be re-cast to bf16 on device EVERY virtual step."""
    if spec.compute_dtype != "bfloat16":
        return g
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if a.dtype == jnp.float32 else a, g.unet_params)
    return g._replace(unet_params=p)


def apply_unet(g: Zero123Guidance, x, t, context,
               spec: Zero123Spec = Zero123Spec()):
    if spec.compute_dtype == "bfloat16":
        # no-op when cast_for_compute already produced bf16 leaves
        p = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, g.unet_params)
        out = spec.unet_module().apply(
            {"params": p}, x.astype(jnp.bfloat16), t,
            context.astype(jnp.bfloat16))
        return out.astype(jnp.float32)
    return spec.unet_module().apply({"params": g.unet_params}, x, t, context)


# ---- geometry helpers (zero123_utils.py:102-136) ----------------------------

def _sph2cart(r, theta, phi):
    return jnp.stack([r * jnp.sin(theta) * jnp.cos(phi),
                      r * jnp.sin(theta) * jnp.sin(phi),
                      r * jnp.cos(theta)], -1)


def angle_between(sph_v1, sph_v2):
    """Pairwise angles (deg-free: inputs radians) between spherical coords
    (r, θ, φ); returns (N, M) radians (zero123_utils.py:102-120)."""
    v1 = _sph2cart(sph_v1[..., 0], sph_v1[..., 1], sph_v1[..., 2])
    v2 = _sph2cart(sph_v2[..., 0], sph_v2[..., 1], sph_v2[..., 2])
    v1 = v1 / (jnp.linalg.norm(v1, axis=-1, keepdims=True) + 1e-12)
    v2 = v2 / (jnp.linalg.norm(v2, axis=-1, keepdims=True) + 1e-12)
    cos = jnp.clip(v1 @ v2.T, -1.0, 1.0)
    return jnp.arccos(cos)


def angle_grad_scale(polar, azimuth, radius, ref_polar, ref_azimuth,
                     ref_radius, grad_scale):
    """Angle-dependent SDS gradient scaling (zero123_utils.py:147-152), single
    reference view: scale = (exp(angle_deg / 180) - 1) * grad_scale."""
    v1 = jnp.stack([radius + ref_radius, jnp.deg2rad(polar + ref_polar),
                    jnp.deg2rad(azimuth + ref_azimuth)], -1).reshape(1, 3)
    v2 = jnp.stack([ref_radius, jnp.deg2rad(ref_polar),
                    jnp.deg2rad(ref_azimuth)], -1).reshape(1, 3)
    ang_deg = jnp.rad2deg(angle_between(v1, v2))[0, 0]
    return (jnp.exp(ang_deg / 180.0) - 1.0) * grad_scale


# ---- SDS train step (zero123_utils.py:138-236) ------------------------------

def sds_loss(g: Zero123Guidance, key: jax.Array, pred_rgb_256: jnp.ndarray,
             c_crossattn: jnp.ndarray, c_concat: jnp.ndarray,
             polar, azimuth, radius,
             min_step, max_step, *,
             guidance_scale: float = 5.0, grad_scale: float = 1.0,
             spec: Zero123Spec = Zero123Spec(), remat: bool = True):
    """One SDS step. pred_rgb_256: (1, 256, 256, 3) in [0,1] (differentiable);
    c_crossattn (1, 1, 768), c_concat (1, 32, 32, 4) from the reference view;
    polar/azimuth/radius: Δ view angles (deg/deg/units); min/max_step traced.
    Returns (loss, t, noise). remat: recompute the VAE encoder forward during
    the backward instead of saving its conv activations — the encoder is the
    only guidance module the SDS gradient flows through (the UNet below is
    stop-gradded, zero123_utils.py:157-158), and its saved activations are
    ~1 GB at 256² that compete with the resident full-scale weights for HBM;
    the recompute is one cheap encoder forward. Exact."""
    k_enc, k_t, k_noise = jax.random.split(key, 3)

    enc = vae_encode_sample
    if remat:
        enc = jax.checkpoint(vae_encode_sample, static_argnums=(3,))
    latents = enc(g, k_enc, pred_rgb_256, spec)                 # (1,32,32,4)
    t = jax.random.randint(k_t, (1,), min_step, max_step + 1)
    noise = jax.random.normal(k_noise, latents.shape)
    latents_noisy = schedule.add_noise(g.alphas_cumprod, latents, noise, t)

    # CFG batch: [uncond, cond]; relative pose folded into the CLIP token
    # T = [Δpolar, sin Δazim, cos Δazim, Δr] (zero123_utils.py:197)
    a_rad = jnp.deg2rad(azimuth)
    T = jnp.stack([jnp.deg2rad(polar), jnp.sin(a_rad), jnp.cos(a_rad),
                   radius], -1).reshape(1, 1, 4)
    clip_emb = jnp.concatenate([c_crossattn, T], -1) @ g.cc_w + g.cc_b
    context = jnp.concatenate([jnp.zeros_like(clip_emb), clip_emb], 0)
    concat = jnp.concatenate([jnp.zeros_like(c_concat), c_concat], 0)

    x_in = jnp.concatenate([latents_noisy] * 2, 0)
    x_in = jnp.concatenate([x_in, concat], -1)                  # 8 channels
    t_in = jnp.concatenate([t] * 2, 0)

    noise_pred = jax.lax.stop_gradient(apply_unet(
        g, jax.lax.stop_gradient(x_in), t_in, context, spec))
    uncond, cond = jnp.split(noise_pred, 2, 0)
    noise_pred = uncond + guidance_scale * (cond - uncond)

    w = 1.0 - g.alphas_cumprod[t]
    # grad_scale is the already-angle-scaled value (angle_grad_scale above)
    grad = (grad_scale * w).reshape(-1, 1, 1, 1) * (noise_pred - noise)
    grad = jnp.nan_to_num(grad)

    targets = jax.lax.stop_gradient(latents - grad)
    loss = 0.5 * jnp.sum((latents - targets) ** 2) / latents.shape[0]
    # diag latents feed the save_guidance panels (zero123_utils.py:215-231);
    # decoded host-side every save_guide_intervel steps
    diag = {"latents": jax.lax.stop_gradient(latents),
            "latents_noisy": latents_noisy, "noise_pred": noise_pred,
            "noise": noise, "t": t}
    return loss, t, noise, diag


def guidance_panels(g: Zero123Guidance, pred_rgb: jnp.ndarray, diag: dict,
                    spec: Zero123Spec = Zero123Spec()) -> jnp.ndarray:
    """Render / noised / denoised / |grad| panel row in [0,1]
    (zero123_utils.py:215-231). pred_rgb: (1, S, S, 3)."""
    noisier = vae_decode(g, diag["latents_noisy"], spec)
    x0 = schedule.predict_start_from_noise(
        g.alphas_cumprod, diag["latents_noisy"], diag["t"], diag["noise_pred"])
    denoised = vae_decode(g, x0, spec)
    grad_vis = jnp.abs(vae_decode(g, diag["noise_pred"] - diag["noise"], spec))
    return jnp.concatenate([pred_rgb, noisier, denoised, grad_vis], axis=2)


# ---- verification sampler (zero123_utils.py:240-275) ------------------------

def novel_view_sample(g: Zero123Guidance, key: jax.Array, image01: jnp.ndarray,
                      polar=0.0, azimuth=0.0, radius=0.0, *,
                      scale: float = 3.0, ddim_steps: int = 50,
                      ddim_eta: float = 1.0,
                      spec: Zero123Spec = Zero123Spec()) -> jnp.ndarray:
    """Full DDIM novel-view synthesis for verification (Zero123.__call__)."""
    c_crossattn = clip_image_embed(g, image01, spec)
    c_concat = vae_encode_mode(g, image01, spec)

    a = np.deg2rad(azimuth)
    T = jnp.asarray([np.deg2rad(polar), np.sin(a), np.cos(a), radius],
                    jnp.float32).reshape(1, 1, 4)
    clip_emb = jnp.concatenate([c_crossattn, T], -1) @ g.cc_w + g.cc_b
    context = jnp.concatenate([jnp.zeros_like(clip_emb), clip_emb], 0)
    concat = jnp.concatenate([jnp.zeros_like(c_concat), c_concat], 0)

    h = image01.shape[1] // 8
    key, k0 = jax.random.split(key)
    latents = jax.random.normal(k0, (1, h, h, 4))

    ts = schedule.ddim_timesteps(spec.num_train_timesteps, ddim_steps)
    for i, t in enumerate(ts):
        t_prev = ts[i + 1] if i + 1 < len(ts) else -1
        x_in = jnp.concatenate([latents] * 2, 0)
        x_in = jnp.concatenate([x_in, concat], -1)
        t_in = jnp.full((2,), int(t), jnp.int32)
        noise_pred = apply_unet(g, x_in, t_in, context, spec)
        uncond, cond = jnp.split(noise_pred, 2, 0)
        noise_pred = uncond + scale * (cond - uncond)
        key, k = jax.random.split(key)
        latents = schedule.ddim_step(g.alphas_cumprod, noise_pred, int(t),
                                     int(t_prev), latents, key=k, eta=ddim_eta)
    return vae_decode(g, latents, spec)
