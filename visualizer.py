"""World-space composition viewer (reference: visualizer.py):

    python visualizer.py --config configs/snoopy.yaml --traj 360

Reloads the final checkpoint, TSDF-fuses the static background from the raw
(masked-out) RGB-D frames, transforms the per-frame reconstructed foreground
meshes back into the raw world frame via the NDR↔raw pose algebra, and renders
a 360°/real-view fly-through with the software rasterizer (replacing Open3D).
"""
from __future__ import annotations

import argparse
import copy
import os
from glob import glob

import numpy as np


class Renderer:
    def __init__(self, config: dict):
        from morpheus_tpu.data.dataset import RenderDataset
        from morpheus_tpu.train.trainer import Trainer

        self.config = config
        self.workspace = os.path.join(config["exp"]["output"],
                                      config["exp"]["exp_name"])
        self.dataset = RenderDataset(config)
        self.trainer = Trainer(config, self.dataset, workspace=self.workspace)
        ckpt = os.path.join(self.workspace, "models",
                            f"model_ep_{config['train']['n_epochs']:04d}.pkl")
        if os.path.exists(ckpt):
            self.trainer.load_ckpt(ckpt)
        else:
            print(f"[warn] checkpoint {ckpt} not found; using random weights")

    def get_recon2world_transform(self, offset=None):
        """NDR(normalized recon space) → raw world per frame
        (visualizer.py:96-108)."""
        out = []
        for i in range(self.dataset.num_frames):
            c2w_raw = copy.deepcopy(self.dataset.poses_raw[i])
            c2w_ndr = copy.deepcopy(self.dataset.poses_ndr[i])
            c2w_ndr[:3, :3] /= self.dataset.sc_ndr
            t = c2w_raw @ np.linalg.inv(c2w_ndr)
            if offset is not None:
                t = t @ offset
            out.append(t)
        return out

    def reconstruct_bg_mesh(self, bg_mesh_path, voxel_size=0.02):
        """TSDF-fuse the background from masked-out raw frames
        (visualizer.py:110-125)."""
        from morpheus_tpu.eval.tsdf import run_tsdf_fusion
        from morpheus_tpu.ops import meshing

        os.makedirs(os.path.dirname(bg_mesh_path), exist_ok=True)
        raw = self.dataset.raw
        vol = run_tsdf_fusion(raw["images"], raw["depths"], raw["masks"],
                              self.dataset.K_raw, self.dataset.poses_raw,
                              voxel_size=voxel_size)
        verts, faces, colors = vol.extract_mesh()
        meshing.save_ply(bg_mesh_path, verts, faces, colors)
        return verts, faces, colors

    def reconstruct_fg_mesh(self, mesh_dir, resolution=256, color=True):
        from morpheus_tpu import mesh_export
        mesh_export.export_all_meshes(
            self.trainer.state.params, self.trainer.spec, mesh_dir,
            self.dataset.num_frames, self.config["train"]["n_epochs"],
            resolution=resolution, color=color)

    def render_world_video(self, mesh_dir, traj_mode="360", scale=1.0,
                           up_tilt_deg=8.0):
        from morpheus_tpu.eval.rasterizer import render_mesh_view
        from morpheus_tpu.ops import meshing
        from morpheus_tpu.vis.pose_utils import create_360_trajectory, rot_x
        from morpheus_tpu.vis.video import write_frames_video

        mesh_transforms = self.get_recon2world_transform()

        bg_mesh_path = os.path.join(self.config["data"]["data_dir"],
                                    "scene_meshes", "bg_mesh.ply")
        if not os.path.exists(bg_mesh_path):
            self.reconstruct_bg_mesh(bg_mesh_path)
        bg_v, bg_f, bg_c = meshing.load_ply(bg_mesh_path)

        if not os.path.exists(mesh_dir) or not glob(os.path.join(mesh_dir,
                                                                 "*.ply")):
            self.reconstruct_fg_mesh(mesh_dir)
        mesh_files = sorted(glob(os.path.join(mesh_dir, "*.ply")))

        ndr2world = mesh_transforms[0]
        target = self.dataset.poses_raw[0][:3, -1] + (
            ndr2world[:3, :3] @ -self.dataset.poses_ndr[0][:3, -1])
        o2w_align = np.eye(4)
        o2w_align[:3, :3] = rot_x(np.deg2rad(up_tilt_deg))
        o2w_align[:3, -1] = np.asarray(target).squeeze()
        up_vec = o2w_align[:3, 1]

        if traj_mode == "real_view":
            c2w_list = list(self.dataset.poses_raw)
        elif traj_mode == "360":
            c2w_ref = copy.deepcopy(self.dataset.poses_raw[0])
            c2w_list = create_360_trajectory(c2w_ref, target, up_vec,
                                             self.dataset.num_frames)
        else:
            raise NotImplementedError(traj_mode)

        H = int(self.dataset.raw["images"].shape[1] * scale)
        W = int(self.dataset.raw["images"].shape[2] * scale)
        K = copy.deepcopy(np.asarray(self.dataset.K_raw, np.float64))
        K[0, :] *= scale
        K[1, :] *= scale

        save_dir = os.path.join(self.workspace, "scene_renderings")
        rgb_dir = os.path.join(save_dir, "rgb")
        os.makedirs(rgb_dir, exist_ok=True)

        import cv2
        frames = []
        for i, mesh_file in enumerate(mesh_files):
            fv, ff, fc = meshing.load_ply(mesh_file)
            T = mesh_transforms[i]
            fv = fv @ T[:3, :3].T + T[:3, 3]
            # composite fg + bg into one mesh for the z-buffered render
            verts = np.concatenate([fv, bg_v], 0)
            faces = np.concatenate([ff, bg_f + len(fv)], 0)
            cols_f = fc if fc is not None else np.full((len(fv), 3), 0.75)
            cols_b = bg_c if bg_c is not None else np.full((len(bg_v), 3), 0.6)
            colors = np.concatenate([cols_f, cols_b], 0)
            rgb, _ = render_mesh_view(verts, faces, c2w_list[i], K, H, W,
                                      vertex_colors=colors)
            img = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(rgb_dir, f"{i:04d}.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            frames.append(img)

        write_frames_video(os.path.join(save_dir,
                                        f"render_{traj_mode}.mp4"),
                           np.stack(frames), fps=25)
        return frames


if __name__ == "__main__":
    from morpheus_tpu.config import parse_cli

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--traj", type=str, default="360")
    args, rest = parser.parse_known_args()

    config = parse_cli(["--config", args.config] + rest)
    renderer = Renderer(config)
    mesh_dir = os.path.join(renderer.workspace, "mesh_final_color_256")
    renderer.render_world_video(mesh_dir, args.traj)
