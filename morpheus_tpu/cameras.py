"""Camera / ray math (reference: datasets/utils.py, datasets/dataset.py:225-330).

Everything here is pure jnp so it can run on host (numpy in) or traced inside the
jitted train step (virtual-view camera sampling happens in-graph to keep the whole
step compiled — the reference does this per-step in Python on CPU,
datasets/dataset.py:435-501).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .utils import safe_normalize


def get_camera_rays(H: int, W: int, fx, fy=None, cx=None, cy=None,
                    convention: str = "OpenGL") -> jnp.ndarray:
    """Per-pixel ray directions in camera space, (H, W, 3).

    Matches the reference's pixel-center convention (datasets/utils.py:28-65):
    x right, y up, looking down -z for OpenGL.
    """
    if fy is None:
        fy = fx
    if cx is None:
        cx, cy = 0.5 * W, 0.5 * H
    i, j = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32), indexing="xy")
    if convention == "OpenGL":
        dirs = jnp.stack([(i + 0.5 - cx) / fx, -(j + 0.5 - cy) / fy,
                          -jnp.ones_like(i)], -1)
    elif convention == "OpenCV":
        dirs = jnp.stack([(i + 0.5 - cx) / fx, (j + 0.5 - cy) / fy,
                          jnp.ones_like(i)], -1)
    else:
        raise NotImplementedError(convention)
    return dirs


def scale_intrinsics(K, scale: float):
    """Scale the top-two rows of an intrinsics matrix (ref: dataset.py:216-223)."""
    K = jnp.asarray(K)
    return K.at[..., :2, :3].multiply(scale)


def c2w_from_cam_center(cam_centers: jnp.ndarray, targets=0.0,
                        keep_chirality: bool = True,
                        convention: str = "OpenGL") -> jnp.ndarray:
    """Look-at camera-to-world matrices, (B, 4, 4) (ref: dataset.py:225-266)."""
    if convention == "OpenGL":
        forward = safe_normalize(cam_centers - targets)
    elif convention == "OpenCV":
        forward = safe_normalize(targets - cam_centers)
    else:
        raise NotImplementedError(convention)
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), forward.shape)
    if keep_chirality:
        right = safe_normalize(jnp.cross(up, forward))
        up = safe_normalize(jnp.cross(forward, right))
    else:
        right = safe_normalize(jnp.cross(forward, up))
        up = safe_normalize(jnp.cross(right, forward))
    B = forward.shape[0]
    poses = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    poses = poses.at[:, :3, :3].set(jnp.stack((right, up, forward), axis=-1))
    poses = poses.at[:, :3, 3].set(cam_centers)
    return poses


def polar_to_cam_center(radius, theta_rad, phi_rad) -> jnp.ndarray:
    """Spherical → cartesian with the reference's y-up convention
    (ref: dataset.py:312-316)."""
    return jnp.stack([
        radius * jnp.sin(theta_rad) * jnp.sin(phi_rad),
        radius * jnp.cos(theta_rad),
        radius * jnp.sin(theta_rad) * jnp.cos(phi_rad),
    ], axis=-1)


def c2w_from_polar(radius, theta_deg, phi_deg,
                   keep_chirality: bool = True,
                   convention: str = "OpenGL") -> jnp.ndarray:
    """Polar coordinates → look-at c2w (ref: dataset.py:268-330)."""
    theta = jnp.deg2rad(jnp.asarray(theta_deg, dtype=jnp.float32))
    phi = jnp.deg2rad(jnp.asarray(phi_deg, dtype=jnp.float32))
    centers = polar_to_cam_center(jnp.asarray(radius, dtype=jnp.float32), theta, phi)
    return c2w_from_cam_center(centers, 0.0, keep_chirality, convention)


def get_view_direction(thetas_rad, phis_rad, overhead_rad, front_rad) -> jnp.ndarray:
    """Discrete view-direction bin (front/side/back/top/bottom), int64 (B,)
    (ref: datasets/utils.py:70-91)."""
    two_pi = 2.0 * math.pi
    phis = jnp.mod(phis_rad, two_pi)
    res = jnp.zeros(thetas_rad.shape[0], dtype=jnp.int32)
    res = jnp.where((phis >= math.pi + front_rad / 2) & (phis < two_pi - front_rad / 2), 1, res)
    res = jnp.where((phis >= math.pi - front_rad / 2) & (phis < math.pi + front_rad / 2), 2, res)
    res = jnp.where((phis >= front_rad / 2) & (phis < math.pi - front_rad / 2), 3, res)
    res = jnp.where(thetas_rad <= overhead_rad, 4, res)
    res = jnp.where(thetas_rad >= math.pi - overhead_rad, 5, res)
    return res


def rays_from_pose(pose: jnp.ndarray, rays_d_cam: jnp.ndarray):
    """World-space ray origins/directions from c2w pose(s).

    pose: (..., 4, 4); rays_d_cam: (H, W, 3) → rays_o, rays_d both (..., H, W, 3).
    (ref: dataset.py:363-366)
    """
    H, W, _ = rays_d_cam.shape
    batch = pose.shape[:-2]
    rays_o = jnp.broadcast_to(pose[..., None, None, :3, 3], batch + (H, W, 3))
    rot = pose[..., None, None, :3, :3]
    rays_d = jnp.sum(rays_d_cam[..., None, :] * rot, -1)
    return rays_o, rays_d


def sample_virtual_camera(key: jax.Array, radius, theta_range_deg, phi_range_deg,
                          uniform_sphere_rate: float = 0.0):
    """Sample one random virtual camera (traced; ref: dataset.py:435-501).

    Returns (c2w (1,4,4), theta_deg (1,), phi_deg (1,)). The uniform-sphere branch
    is selected by a traced bernoulli like the reference's random.random() gate.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    th_lo, th_hi = jnp.deg2rad(theta_range_deg[0]), jnp.deg2rad(theta_range_deg[1])
    ph_lo, ph_hi = jnp.deg2rad(phi_range_deg[0]), jnp.deg2rad(phi_range_deg[1])

    # range-sampled branch
    theta_r = jax.random.uniform(k1, (1,)) * (th_hi - th_lo) + th_lo
    phi_r = jax.random.uniform(k2, (1,)) * (ph_hi - ph_lo) + ph_lo
    phi_r = jnp.where(phi_r < 0, phi_r + 2 * math.pi, phi_r)

    # uniform-sphere branch (upper hemisphere-weighted like the reference)
    g = jax.random.normal(k3, (1, 3))
    unit = safe_normalize(jnp.stack([g[:, 0], jnp.abs(g[:, 1]), g[:, 2]], -1))
    theta_u = jnp.arccos(jnp.clip(unit[:, 1], -1.0, 1.0))
    phi_u = jnp.arctan2(unit[:, 0], unit[:, 2])
    phi_u = jnp.where(phi_u < 0, phi_u + 2 * math.pi, phi_u)

    use_uniform = jax.random.uniform(jax.random.fold_in(key, 7), ()) < uniform_sphere_rate
    theta = jnp.where(use_uniform, theta_u, theta_r)
    phi = jnp.where(use_uniform, phi_u, phi_r)

    centers = polar_to_cam_center(jnp.asarray(radius, jnp.float32), theta, phi)
    c2w = c2w_from_cam_center(centers)
    return c2w, jnp.rad2deg(theta), jnp.rad2deg(phi)


def euler_to_rotation(rotations: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (..., 3) → rotation matrices (..., 3, 3); column layout matches
    the reference PoseArray (models/pose.py:35-58)."""
    ca, cb, cg = (jnp.cos(rotations[..., i]) for i in range(3))
    sa, sb, sg = (jnp.sin(rotations[..., i]) for i in range(3))
    col1 = jnp.stack([ca * cb, sa * cb, -sb], -1)
    col2 = jnp.stack([ca * sb * sg - sa * cg, sa * sb * sg + ca * cg, cb * sg], -1)
    col3 = jnp.stack([ca * sb * cg + sa * sg, sa * sb * cg - ca * sg, cb * cg], -1)
    return jnp.stack([col1, col2, col3], -1)


def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3x4 projection matrix into intrinsics + c2w pose.

    Pure-numpy RQ-based replacement for cv2.decomposeProjectionMatrix
    (reference: datasets/utils.py:5-26).
    """
    P = np.asarray(P, dtype=np.float64)[:3, :4]
    M = P[:, :3]
    # RQ decomposition of M = K R via flipped QR
    Pflip = np.flipud(M).T
    Q, R = np.linalg.qr(Pflip)
    K = np.flipud(np.fliplr(R.T))
    Rmat = np.flipud(Q.T)
    # enforce positive diagonal on K
    sign = np.diag(np.sign(np.diag(K)))
    K = K @ sign
    Rmat = sign @ Rmat
    if np.linalg.det(Rmat) < 0:
        Rmat = -Rmat
    t = np.linalg.solve(K, P[:, 3])
    cam_center = -Rmat.T @ t
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = Rmat.T
    pose[:3, 3] = cam_center
    return intrinsics, pose
