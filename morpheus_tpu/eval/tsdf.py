"""Dense TSDF fusion of posed RGB-D frames — replaces Open3D's
ScalableTSDFVolume (reference: tools/vis.py:315-361 run_tsdf_fusion, used by
visualizer.py:110-125 to reconstruct the static background)."""
from __future__ import annotations

import numpy as np

from ..ops import meshing


class TSDFVolume:
    def __init__(self, bounds: np.ndarray, voxel_size: float,
                 sdf_trunc: float | None = None):
        """bounds: (2, 3) [min, max] in world units."""
        self.bounds = np.asarray(bounds, np.float64)
        self.voxel_size = voxel_size
        self.sdf_trunc = sdf_trunc or 4.0 * voxel_size
        dims = np.ceil((self.bounds[1] - self.bounds[0]) / voxel_size
                       ).astype(int) + 1
        self.dims = dims
        self.tsdf = np.ones(dims, np.float32)
        self.weight = np.zeros(dims, np.float32)
        self.color = np.zeros(tuple(dims) + (3,), np.float32)
        g = [self.bounds[0][i] + np.arange(dims[i]) * voxel_size
             for i in range(3)]
        xx, yy, zz = np.meshgrid(*g, indexing="ij")
        self._pts = np.stack([xx, yy, zz], -1).reshape(-1, 3)

    def integrate(self, rgb: np.ndarray, depth: np.ndarray, K: np.ndarray,
                  c2w_gl: np.ndarray, depth_max: float = 10.0):
        """Integrate one frame. rgb (H, W, 3) [0,1]; depth (H, W) z-depth;
        c2w OpenGL convention."""
        H, W = depth.shape
        c2w = np.asarray(c2w_gl, np.float64).copy()
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1
        w2c = np.linalg.inv(c2w)
        cam = self._pts @ w2c[:3, :3].T + w2c[:3, 3]
        z = cam[:, 2]
        u = np.round(K[0, 0] * cam[:, 0] / np.maximum(z, 1e-9) + K[0, 2]
                     ).astype(np.int64)
        v = np.round(K[1, 1] * cam[:, 1] / np.maximum(z, 1e-9) + K[1, 2]
                     ).astype(np.int64)
        valid = (z > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        ui, vi = np.clip(u, 0, W - 1), np.clip(v, 0, H - 1)
        d = depth[vi, ui]
        valid &= (d > 0) & (d < depth_max)
        sdf = d - z
        valid &= sdf > -self.sdf_trunc
        tsdf_new = np.clip(sdf / self.sdf_trunc, -1.0, 1.0)

        w_old = self.weight.reshape(-1)
        t_old = self.tsdf.reshape(-1)
        c_old = self.color.reshape(-1, 3)
        w_new = np.where(valid, 1.0, 0.0)
        w_tot = w_old + w_new
        t_upd = np.where(valid, (t_old * w_old + tsdf_new * w_new)
                         / np.maximum(w_tot, 1e-9), t_old)
        c_frame = rgb[vi, ui]
        c_upd = np.where(valid[:, None],
                         (c_old * w_old[:, None] + c_frame * w_new[:, None])
                         / np.maximum(w_tot[:, None], 1e-9), c_old)
        self.tsdf = t_upd.reshape(self.dims).astype(np.float32)
        self.weight = w_tot.reshape(self.dims).astype(np.float32)
        self.color = c_upd.reshape(tuple(self.dims) + (3,)).astype(np.float32)

    def extract_mesh(self, min_weight: float = 1.0):
        """Zero iso-surface of the fused TSDF (observed voxels only)."""
        vol = np.where(self.weight >= min_weight, self.tsdf, 1.0)
        verts_idx, faces = meshing.extract_isosurface(vol, level=0.0)
        verts = self.bounds[0] + verts_idx * self.voxel_size
        colors = None
        if len(verts):
            idx = np.clip(np.round(verts_idx).astype(int), 0,
                          np.asarray(self.dims) - 1)
            colors = self.color[idx[:, 0], idx[:, 1], idx[:, 2]]
        return verts.astype(np.float32), faces, colors


def run_tsdf_fusion(images, depths, masks, K, poses_gl, voxel_size=0.02,
                    bounds=None, mask_out_object: bool = True,
                    depth_max: float = 10.0):
    """Fuse the background (object masked out) like reconstruct_bg_mesh
    (visualizer.py:110-125): depth of masked-object pixels is dropped."""
    if bounds is None:
        bounds = np.array([[-4.0, -4.0, -4.0], [4.0, 4.0, 4.0]])
    vol = TSDFVolume(bounds, voxel_size)
    for i in range(len(images)):
        d = depths[i].copy()
        if mask_out_object:
            d[masks[i] > 0.5] = 0.0
        vol.integrate(images[i], d, K, poses_gl[i], depth_max=depth_max)
    return vol
