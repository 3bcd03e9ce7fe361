"""RGB-D sequence dataset + ray sampling (reference: datasets/dataset.py).

Host side (numpy/cv2): decode the whole sequence into memory, pose outlier
rejection, intrinsics. Device side: one pytree of arrays; per-step ray sampling
happens *inside* the jitted train step (gathers over frame/pixel indices) —
unlike the reference, which assembles each batch in Python on CPU
(datasets/dataset.py:398-433) and pays a host→device copy every step.

Ray directions are reconstructed in-graph from the cached camera-space grid and
the frame pose instead of precomputing the full (T, H*W, 3) world-space ray
tensor (datasets/dataset.py:336-396) — same math, ~6x less HBM.
"""
from __future__ import annotations

import copy
import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from .. import cameras


def remove_outlier(poses: np.ndarray, theta, phi, radius, thresh: float = 2.0):
    """Z-score walk pose-outlier rejection (datasets/dataset.py:77-143).
    Mutates theta/phi/radius in place like the reference; returns new poses."""
    num_frames = poses.shape[0]
    trans = poses[:, :3, 3]
    diff = np.sqrt(((trans[1:] - trans[:-1]) ** 2).sum(-1))
    mean, std = diff.mean(), diff.std() + 1e-12
    z = (diff - mean) / std
    outlier_indices = np.where(np.abs(z) > thresh)[0]

    trans_new = trans.copy()
    pose_new = poses.copy()
    final = []
    for i in outlier_indices:
        index = i + 1
        while index <= num_frames - 1:
            prev_diff = np.sqrt(((trans_new[index] - trans_new[index - 1]) ** 2).sum())
            if (prev_diff - mean) / std > thresh:
                final.append(int(index))
                trans_new[index] = trans_new[index - 1]
                pose_new[index] = pose_new[index - 1]
                theta[index] = theta[index - 1]
                phi[index] = phi[index - 1]
                radius[index] = radius[index - 1]
                if index > num_frames - 2:
                    break
                next_diff = np.sqrt(((trans_new[index + 1] - trans_new[index]) ** 2).sum())
                if (next_diff - mean) / std > thresh:
                    index += 1
                else:
                    break
            else:
                break
    if final:
        print("Outlier removed:", final)
    return pose_new


class DeformDataset:
    """Loads a preprocessed sequence (color_virt/ depth_raw_crop/ mask_virt/
    poses_virt/ K_virt.txt r_theta_phi.txt — datasets/dataset.py:45-178) or
    wraps an in-memory dict (synthetic scenes)."""

    def __init__(self, config: dict, scene: dict | None = None):
        self.cfg = config
        if scene is None:
            scene = self._load_from_disk(config["data"]["data_dir"])
        self.images = scene["images"]          # (T,H,W,3) float [0,1]
        self.depths = scene["depths"]          # (T,H,W) meters
        self.masks = scene["masks"]            # (T,H,W) float [0,1]
        self.poses = scene["poses"]            # (T,4,4) OpenGL c2w
        self.intrinsics = np.asarray(scene["K"], np.float64)
        self.radius = scene["radius"]
        self.theta = scene["theta"]
        self.phi = scene["phi"]
        self.num_frames = self.images.shape[0]
        self.H, self.W = self.images.shape[1:3]
        self.bounding_box = np.array([-1.01, -1.01, -1.01, 1.01, 1.01, 1.01],
                                     np.float32)
        self.bound = float(np.abs(self.bounding_box).max())

        if config["data"].get("outlier_remove", False):
            self.poses = remove_outlier(self.poses, self.theta, self.phi,
                                        self.radius)

    def _load_from_disk(self, data_dir: str) -> dict:
        import cv2
        depth_scale = self.cfg["data"]["depth_scale"]
        p_images = sorted(glob(os.path.join(data_dir, "color_virt/*.png")))
        p_depths = sorted(glob(os.path.join(data_dir, "depth_raw_crop/*.png")))
        p_masks = sorted(glob(os.path.join(data_dir, "mask_virt/*.png")))
        if not p_images:
            raise FileNotFoundError(f"no frames under {data_dir}")
        images = np.stack([cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
                           for p in p_images]).astype(np.float32) / 255.0
        depths = np.stack([cv2.imread(p, cv2.IMREAD_UNCHANGED)
                           for p in p_depths]).astype(np.float32) / depth_scale
        masks = np.stack([cv2.imread(p, cv2.IMREAD_UNCHANGED)
                          for p in p_masks]).astype(np.float32) / 255.0
        K = np.loadtxt(os.path.join(data_dir, "K_virt.txt"))
        rtp = np.loadtxt(os.path.join(data_dir, "r_theta_phi.txt"))
        p_poses = sorted(glob(os.path.join(data_dir, "poses_virt/*.txt")))
        poses = np.stack([np.loadtxt(p) for p in p_poses]).astype(np.float32)
        return {
            "images": images, "depths": depths, "masks": masks, "poses": poses,
            "K": K, "radius": rtp[:, 0].astype(np.float32),
            "theta": rtp[:, 1].astype(np.float32),
            "phi": rtp[:, 2].astype(np.float32),
        }

    # ---- device-side bundles ----

    def device_data(self, scale: float = 1.0) -> dict:
        """All frames + cached camera-ray grid as jnp arrays, at an optional
        image scale (reference known_view_scale, dataset.py:336-346)."""
        import cv2
        H, W = int(scale * self.H), int(scale * self.W)
        K = cameras.scale_intrinsics(jnp.asarray(self.intrinsics, jnp.float32),
                                     scale)
        if (H, W) != (self.H, self.W):
            images = np.stack([cv2.resize(im, (W, H), interpolation=cv2.INTER_LINEAR)
                               for im in self.images])
            depths = np.stack([cv2.resize(d, (W, H), interpolation=cv2.INTER_NEAREST)
                               for d in self.depths])
            masks = np.stack([cv2.resize(m, (W, H), interpolation=cv2.INTER_NEAREST)
                              for m in self.masks])
        else:
            images, depths, masks = self.images, self.depths, self.masks

        rays_d_cam = cameras.get_camera_rays(H, W, K[0, 0], K[1, 1], K[0, 2],
                                             K[1, 2])
        return {
            "images": jnp.asarray(images.reshape(self.num_frames, H * W, 3)),
            "depths": jnp.asarray(depths.reshape(self.num_frames, H * W)),
            "masks": jnp.asarray(masks.reshape(self.num_frames, H * W)),
            "poses": jnp.asarray(self.poses, jnp.float32),
            "rays_d_cam": rays_d_cam.reshape(H * W, 3),
            "radius": jnp.asarray(self.radius),
            "theta": jnp.asarray(self.theta),
            "phi": jnp.asarray(self.phi),
            "H": H, "W": W,
        }


def sample_real_view_rays(key: jax.Array, data: dict, num_frames: int,
                          ray_num: int, frame_idx=None):
    """In-graph real-view batch: one random frame, `ray_num` random pixels
    (reference: dataset.py:398-433 + morpheus.py:826). Returns a dict of
    (ray_num, ...) arrays."""
    k_f, k_p = jax.random.split(key)
    if frame_idx is None:
        frame_idx = jax.random.randint(k_f, (), 0, num_frames)
    pix = jax.random.randint(k_p, (ray_num,), 0, data["rays_d_cam"].shape[0])

    pose = data["poses"][frame_idx]
    d_cam = data["rays_d_cam"][pix]
    rays_o = jnp.broadcast_to(pose[:3, 3], (ray_num, 3))
    rays_d = jnp.sum(d_cam[..., None, :] * pose[:3, :3], -1)
    t_norm = frame_idx.astype(jnp.float32) / num_frames
    return {
        "rays_o": rays_o, "rays_d": rays_d,
        "rays_t": jnp.full((ray_num, 1), t_norm),
        "rays_id": jnp.full((ray_num,), frame_idx, jnp.int32),
        "image": data["images"][frame_idx, pix],
        "depth": data["depths"][frame_idx, pix],
        "mask": data["masks"][frame_idx, pix],
        "frame_idx": frame_idx,
    }


def full_frame_rays(data: dict, num_frames: int, frame_idx: int):
    """All rays of one frame (eval/video rendering)."""
    pose = data["poses"][frame_idx]
    d_cam = data["rays_d_cam"]
    N = d_cam.shape[0]
    rays_o = jnp.broadcast_to(pose[:3, 3], (N, 3))
    rays_d = jnp.sum(d_cam[..., None, :] * pose[:3, :3], -1)
    t_norm = jnp.asarray(frame_idx, jnp.float32) / num_frames
    return {
        "rays_o": rays_o, "rays_d": rays_d,
        "rays_t": jnp.full((N, 1), t_norm),
        "rays_id": jnp.full((N,), frame_idx, jnp.int32),
    }


class VirtualViewSampler:
    """Virtual-view ray batches at a fixed novel-view scale
    (reference: dataset.py:435-578). The scaled camera-ray grid is cached at
    construction; the random camera itself is sampled in-graph.
    """

    def __init__(self, dataset: DeformDataset, config: dict, scale: float):
        self.config = config
        self.num_frames = dataset.num_frames
        self.H = int(scale * dataset.H)
        self.W = int(scale * dataset.W)
        K = cameras.scale_intrinsics(
            jnp.asarray(dataset.intrinsics, jnp.float32), scale)
        self.rays_d_cam = cameras.get_camera_rays(
            self.H, self.W, K[0, 0], K[1, 1], K[0, 2], K[1, 2]).reshape(-1, 3)
        self.radius = jnp.asarray(dataset.radius)
        self.theta = jnp.asarray(dataset.theta)
        self.phi = jnp.asarray(dataset.phi)

    def sample(self, key: jax.Array, frame_idx=None, theta_deg=None,
               phi_deg=None, radius_scale=None, theta_range=None,
               phi_range=None):
        """Random frame + random polar camera (or fixed angles for eval
        renders; reference get_c2w_from_polar path, dataset.py:526-532).
        Returns rays + Δ(polar, azimuth, radius) wrt the frame's real view.
        theta_range/phi_range override the config ranges with traced scalars
        (progressive_view curriculum, morpheus.py:796-806)."""
        k_f, k_cam = jax.random.split(key)
        if frame_idx is None:
            frame_idx = jax.random.randint(k_f, (), 0, self.num_frames)
        radius = self.radius[frame_idx] * self.config["data"][
            "novel_view_scale_factor"]
        if radius_scale is not None:
            radius = radius * radius_scale

        if theta_deg is None:
            c2w, thetas, phis = cameras.sample_virtual_camera(
                k_cam, radius,
                theta_range_deg=(theta_range if theta_range is not None
                                 else self.config["data"]["theta_range"]),
                phi_range_deg=(phi_range if phi_range is not None
                               else self.config["data"]["phi_range"]),
                uniform_sphere_rate=self.config["data"]["uniform_sphere_rate"])
        else:
            thetas = jnp.asarray(theta_deg, jnp.float32).reshape(1)
            phis = jnp.asarray(phi_deg, jnp.float32).reshape(1)
            c2w = cameras.c2w_from_polar(radius, thetas, phis)

        pose = c2w[0]
        N = self.rays_d_cam.shape[0]
        rays_o = jnp.broadcast_to(pose[:3, 3], (N, 3))
        rays_d = jnp.sum(self.rays_d_cam[..., None, :] * pose[:3, :3], -1)
        t_norm = frame_idx.astype(jnp.float32) / self.num_frames \
            if hasattr(frame_idx, "astype") else frame_idx / self.num_frames

        delta_polar = thetas - self.theta[frame_idx]
        delta_azimuth = phis - self.phi[frame_idx]
        delta_azimuth = jnp.where(delta_azimuth > 180, delta_azimuth - 360,
                                  delta_azimuth)
        delta_radius = jnp.reshape(radius - self.radius[frame_idx], (1,))
        return {
            "rays_o": rays_o, "rays_d": rays_d,
            "rays_t": jnp.full((N, 1), t_norm),
            "rays_id": jnp.full((N,), frame_idx, jnp.int32),
            "polar": delta_polar, "azimuth": delta_azimuth,
            "radius": delta_radius, "frame_idx": frame_idx,
            "H": self.H, "W": self.W,
        }


class RenderDataset(DeformDataset):
    """World-space rendering dataset: adds the raw and NDR (normalized) camera
    spaces on top of the training layout (reference: datasets/dataset.py
    RenderDataset :581-694). Raw frames live under rgb/ depth/ mask/; the NDR
    space comes from cameras_sphere.npz (world+scale matrices)."""

    def __init__(self, config: dict, scene: dict | None = None):
        super().__init__(config, scene=scene)
        self.raw = self._load_raw(config["data"]["data_dir"])
        self.poses_ndr, self.K_ndr, self.sc_ndr = self._load_ndr(
            config["data"]["data_dir"])
        self.poses_raw = np.stack(
            [np.diag([1.0, -1.0, -1.0, 1.0]) for _ in range(self.num_frames)])
        self.K_raw = self.K_ndr

    def _load_raw(self, data_dir):
        import cv2
        from glob import glob as _glob
        depth_scale = self.cfg["data"]["depth_scale"]
        p_images = sorted(_glob(os.path.join(data_dir, "rgb/*.png"))) or \
            sorted(_glob(os.path.join(data_dir, "rgb/*.jpg")))
        p_depths = sorted(_glob(os.path.join(data_dir, "depth/*.png")))
        p_masks = sorted(_glob(os.path.join(data_dir, "mask/*.png")))
        images = np.stack([cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
                           for p in p_images]).astype(np.float32) / 255.0
        depths = np.stack([cv2.imread(p, cv2.IMREAD_UNCHANGED)
                           for p in p_depths]).astype(np.float32) / depth_scale
        masks_raw = np.stack([cv2.imread(p, cv2.IMREAD_UNCHANGED)
                              for p in p_masks]).astype(np.float32)
        if masks_raw.ndim == 4:
            masks_raw = masks_raw[..., 0]
        masks = masks_raw / max(masks_raw.max(), 1.0)
        return {"images": images, "depths": depths, "masks": masks}

    def _load_ndr(self, data_dir):
        from .. import cameras as cam_lib
        cams = np.load(os.path.join(data_dir, "cameras_sphere.npz"))
        align = np.diag([1.0, -1.0, -1.0, 1.0])
        poses, Ks = [], []
        sc = float(cams["scale_mat_0"][0, 0])
        for i in range(self.num_frames):
            P = (cams[f"world_mat_{i}"] @ cams[f"scale_mat_{i}"])[:3, :4]
            K, pose = cam_lib.load_K_Rt_from_P(P)
            poses.append(align @ pose.astype(np.float64))
            Ks.append(K[:3, :3])
        return np.stack(poses), Ks[0], sc
