"""Test-video rendering (reference: morpheus.py:1238-1375 eval_step /
render_test_video)."""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import renderer
from ..data import dataset as data_lib
from ..model import field


@partial(jax.jit, static_argnames=("spec", "eval_cfg", "cano",
                                   "optimize_pose"))
def _render_chunk(params, occ, key, o, d, t, i, bg, spec, eval_cfg, cano,
                  optimize_pose):
    out = renderer.render_rays(
        params, spec, occ, key, o, d, t, i, eval_cfg, bg_color=bg,
        cano=cano, optimize_pose=optimize_pose, train=False, real_view=False)
    return out["image"], out["depth"], out["opacity"]


def eval_render(params, spec, occ, rcfg, rays, key=None, cano: bool = False,
                optimize_pose: bool = False, max_chunk: int = 300 * 300,
                bg_color=1.0):
    """Chunked albedo render of a full frame (morpheus.py:1238-1269).
    rays: dict with rays_o/rays_d/rays_t/rays_id (N, ...). The jitted chunk
    renderer is cached module-wide, keyed by the static (spec, config, flags) —
    repeat calls across frames/videos reuse one compilation."""
    key = jax.random.PRNGKey(0) if key is None else key
    N = rays["rays_o"].shape[0]
    n_chunks = max(1, -(-N // max_chunk))
    chunk = -(-N // n_chunks)
    # pad to an even multiple so every chunk compiles to one shape
    pad = chunk * n_chunks - N

    def pad_a(a):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.repeat(a[-1:], pad, 0)], 0)

    ro, rd = pad_a(rays["rays_o"]), pad_a(rays["rays_d"])
    rt, ri = pad_a(rays["rays_t"]), pad_a(rays["rays_id"])
    bg = jnp.asarray(bg_color, jnp.float32)

    eval_cfg = renderer.RenderConfig(**{
        **rcfg.__dict__, "compute_normals": False, "normal_smooth_3d": False,
        "normal_smoothness": False, "code_reg": False})

    imgs, deps, ops = [], [], []
    for c in range(n_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        im, de, op = _render_chunk(params, occ, key, ro[sl], rd[sl], rt[sl],
                                   ri[sl], bg, spec, eval_cfg, cano,
                                   optimize_pose)
        imgs.append(np.asarray(im))
        deps.append(np.asarray(de))
        ops.append(np.asarray(op))
    image = np.concatenate(imgs, 0)[:N]
    depth = np.concatenate(deps, 0)[:N]
    opac = np.concatenate(ops, 0)[:N]
    return image, depth, opac


def render_test_video(trainer, save_path: str, test_name: str = "test",
                      phis: float = 0.0, cano: bool = False,
                      real_view: bool = False, view_360: bool = False,
                      fps: int = 25, scale: float = 1.0, write_video=True,
                      eval_clip: bool = False, clip_encoder=None, log=print):
    """Render the per-frame diagnostic videos (morpheus.py:1285-1375), using
    the EMA weights like the reference. With eval_clip, scores CLIP cosine
    similarity of each rendered frame against the masked GT frame
    (morpheus.py:1339-1374)."""
    os.makedirs(save_path, exist_ok=True)
    name = f"{test_name}_ep{trainer.epoch:04d}"
    params = trainer.state.ema
    ds = trainer.dataset
    cfg = trainer.config

    clip_total = 0.0
    preds, preds_depth = [], []
    sampler = data_lib.VirtualViewSampler(ds, cfg, scale=scale)
    for i in range(ds.num_frames):
        if real_view:
            rays = data_lib.full_frame_rays(trainer.data, ds.num_frames, i)
            H, W = trainer.data["H"], trainer.data["W"]
        else:
            if cano:
                t, phi = 0, i / ds.num_frames
            elif view_360:
                t, phi = i, i / ds.num_frames
            else:
                t, phi = i, phis
            rays = sampler.sample(jax.random.PRNGKey(i), frame_idx=t,
                                  theta_deg=cfg["data"]["default_polar"],
                                  phi_deg=phi * 360.0)
            H, W = sampler.H, sampler.W

        img, dep, _ = eval_render(params, trainer.spec, trainer.state.occ,
                                  trainer.rcfg, rays, cano=cano,
                                  optimize_pose=real_view)
        img01 = np.clip(img.reshape(H, W, 3), 0, 1)
        img = (img01 * 255).astype(np.uint8)
        dep = dep.reshape(H, W)
        dep = (dep - dep.min()) / (dep.max() - dep.min() + 1e-6)
        preds.append(img)
        preds_depth.append((dep * 255).astype(np.uint8))

        if eval_clip and clip_encoder is not None:
            gt_mask = (np.asarray(ds.masks[i]) > 0.5).astype(np.float32)
            gt = np.asarray(ds.images[i]) * gt_mask[..., None] \
                + (1.0 - gt_mask[..., None])
            clip_total += clip_encoder.get_similarity_from_image(
                img01[None], gt[None].astype(np.float32))

    if eval_clip and clip_encoder is not None:
        log(f"==> CLIP={clip_total / ds.num_frames:.4f} ({name})")

    if write_video:
        write_frames_video(os.path.join(save_path, f"{name}_rgb.mp4"),
                           np.stack(preds), fps)
        depth3 = np.stack([np.repeat(d[..., None], 3, -1)
                           for d in preds_depth])
        write_frames_video(os.path.join(save_path, f"{name}_depth.mp4"),
                           depth3, fps)
    return preds, preds_depth


def write_frames_video(path: str, frames: np.ndarray, fps: int = 25):
    """mp4 via OpenCV's bundled encoder (no ffmpeg binary in this image);
    falls back to per-frame PNGs (the reference's write_video=False path,
    morpheus.py:1334-1336)."""
    import cv2

    T, H, W = frames.shape[:3]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
    if vw.isOpened():
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        return path
    base = path.rsplit(".", 1)[0]
    for i, f in enumerate(frames):
        cv2.imwrite(f"{base}_{i:04d}.png", cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    return base
