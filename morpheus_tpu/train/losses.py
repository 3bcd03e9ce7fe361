"""Loss library (reference: utils.py:91-113, morpheus.py:530-556,709-792,
946-1145).

All losses are pure functions on fixed-shape masked sample volumes: where the
reference indexes ragged per-ray samples, these take (N, K) arrays + validity
masks and normalize by mask counts.
"""
from __future__ import annotations

import jax.numpy as jnp


def _masked_mean(x, mask, eps=1e-8):
    return jnp.sum(jnp.where(mask, x, 0.0)) / (jnp.sum(mask) + eps)


def sdf_losses(t_mid, target_d, predicted_sdf, truncation, sample_mask,
               ray_mask=None):
    """TSDF-style free-space + truncation-band SDF losses along rays
    (reference: utils.py:91-113).

    t_mid, predicted_sdf: (N, K); target_d: (N, 1) GT depth per ray;
    sample_mask: (N, K) valid samples; ray_mask: (N, 1) object mask.
    Returns (fs_loss, sdf_loss).
    """
    depth_mask = target_d > 0.0                                   # (N,1)
    front_mask = t_mid < (target_d - truncation)
    front_mask = front_mask | ((target_d < 0.0) & (t_mid < 3.5))
    bound = target_d - t_mid
    bound = jnp.where(depth_mask, bound, 10.0)
    sdf_mask = (jnp.abs(bound) <= truncation) & depth_mask
    if ray_mask is not None:
        sdf_mask = sdf_mask & (ray_mask > 0.5)

    front_mask = front_mask & sample_mask
    sdf_mask = sdf_mask & sample_mask

    sum_of_samples = front_mask.sum(-1) + sdf_mask.sum(-1) + 1e-8   # (N,)
    rays_w_depth = jnp.count_nonzero(target_d) + 1e-8

    fs = jnp.clip(jnp.maximum(jnp.exp(-5.0 * predicted_sdf) - 1.0,
                              predicted_sdf - bound), 0.0, None)
    fs_loss = jnp.sum(jnp.where(front_mask, fs, 0.0), -1) / sum_of_samples
    fs_loss = jnp.sum(fs_loss) / rays_w_depth

    sdf_l = jnp.abs(predicted_sdf - bound)
    sdf_loss = jnp.sum(jnp.where(sdf_mask, sdf_l, 0.0), -1) / sum_of_samples
    sdf_loss = jnp.sum(sdf_loss) / rays_w_depth
    return fs_loss, sdf_loss


def sdf_losses_flat(t_mid, target_d, predicted_sdf, truncation, valid,
                    ray_id, starts, ray_mask=None):
    """sdf_losses on a flat ray-sorted sample stream (see
    ops/volrender.flat_render_weights). t_mid/predicted_sdf/valid: (B,);
    target_d: (N,) per-ray GT depth; ray_id (B,), starts (N+1,).
    Identical math to sdf_losses — per-ray sums become cumsum boundary
    differences."""
    td = jnp.take(target_d, ray_id)                                # (B,)
    depth_mask = td > 0.0
    front_mask = t_mid < (td - truncation)
    front_mask = front_mask | ((td < 0.0) & (t_mid < 3.5))
    bound = jnp.where(depth_mask, td - t_mid, 10.0)
    sdf_mask = (jnp.abs(bound) <= truncation) & depth_mask
    if ray_mask is not None:
        sdf_mask = sdf_mask & (jnp.take(ray_mask, ray_id) > 0.5)

    front_mask = front_mask & valid
    sdf_mask = sdf_mask & valid

    from ..ops import volrender

    def per_ray_sum(x):
        return volrender.flat_segment_sum(x, ray_id, starts)          # (N,)

    sum_of_samples = (per_ray_sum(front_mask.astype(jnp.float32))
                      + per_ray_sum(sdf_mask.astype(jnp.float32)) + 1e-8)
    rays_w_depth = jnp.count_nonzero(target_d) + 1e-8

    fs = jnp.clip(jnp.maximum(jnp.exp(-5.0 * predicted_sdf) - 1.0,
                              predicted_sdf - bound), 0.0, None)
    fs_loss = jnp.sum(per_ray_sum(jnp.where(front_mask, fs, 0.0))
                      / sum_of_samples) / rays_w_depth

    sdf_l = jnp.abs(predicted_sdf - bound)
    sdf_loss = jnp.sum(per_ray_sum(jnp.where(sdf_mask, sdf_l, 0.0))
                       / sum_of_samples) / rays_w_depth
    return fs_loss, sdf_loss


def orientation_loss_flat(weights, normals, dirs, valid, num_rays):
    """orientation_loss on a flat stream: mean over rays of per-ray sums ==
    sum of all per-sample terms / N."""
    n_dot_d = jnp.sum(normals * dirs, -1)
    term = jnp.clip(n_dot_d, 0.0, None) ** 2 * jnp.where(valid, weights, 0.0)
    return jnp.sum(term) / num_rays


def rgb_loss(pred_rgb, gt_rgb):
    return jnp.mean((pred_rgb - gt_rgb) ** 2)


def mask_loss(pred_opacity, gt_mask):
    """BCE on accumulated opacity (morpheus.py:958-960)."""
    p = jnp.clip(pred_opacity, 1e-5, 1.0 - 1e-5)
    return -jnp.mean(gt_mask * jnp.log(p) + (1.0 - gt_mask) * jnp.log(1.0 - p))


def depth_loss(pred_depth, gt_depth, rays_o, rays_d, gt_mask,
               outside_radius: float = 1.1):
    """Masked depth MSE with outlier rejection (morpheus.py:963-981)."""
    xyzs = rays_o + gt_depth[..., None] * rays_d
    pts_norm = jnp.linalg.norm(xyzs, axis=-1)
    valid = (gt_depth > 0) & (pts_norm <= outside_radius) & (gt_mask > 0.5)
    return jnp.mean((jnp.where(valid, pred_depth, 0.0)
                     - jnp.where(valid, gt_depth, 0.0)) ** 2)


def orientation_loss(weights, normals, dirs, mask):
    """Penalize normals facing away from the camera (morpheus.py:709-712).
    weights are detached by the caller (reference uses weights.detach())."""
    n_dot_d = jnp.sum(normals * dirs, -1)
    term = jnp.clip(n_dot_d, 0.0, None) ** 2 * jnp.where(mask, weights, 0.0)
    return jnp.mean(jnp.sum(term, -1))


def entropy_loss(weights, mask):
    a = jnp.clip(weights, 1e-5, 1 - 1e-5)
    ent = -a * jnp.log2(a) - (1 - a) * jnp.log2(1 - a)
    return _masked_mean(ent, mask)


def eikonal_loss(normal_raw, mask=None):
    err = (jnp.linalg.norm(normal_raw, axis=-1) - 1.0) ** 2
    if mask is None:
        return jnp.mean(err)
    return _masked_mean(err, mask)


def normal_perturb_loss(normals, normals_perturb, mask=None):
    d = jnp.abs(normals - normals_perturb)
    if mask is None:
        return jnp.mean(d)
    return _masked_mean(d, mask[..., None] & jnp.ones_like(d, bool))


def code_smoothness(code, code_prev, code_next):
    """Second-difference temporal code regularizer (morpheus.py:762-771)."""
    return jnp.mean((2.0 * code - code_prev - code_next) ** 2)
