"""Preprocess pipeline integration: synthetic raw RGB-D → robust-ICP pose init
→ virtual cameras → loadable DeformDataset with cross-frame-consistent
geometry."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from morpheus_tpu.cameras import load_K_Rt_from_P
from morpheus_tpu.config import merge_defaults
from morpheus_tpu.data.dataset import DeformDataset
from morpheus_tpu.data.synthetic import make_synthetic_scene
from morpheus_tpu.preprocess import pose_init, virtual_cams


def _write_raw_dataset(tmp_path, scene, with_gt_cameras=False):
    """Write rgb/ depth/ mask/ + intrinsics.txt (+ GT cameras_sphere.npz)."""
    d = str(tmp_path)
    for sub in ("rgb", "depth", "mask"):
        os.makedirs(os.path.join(d, sub), exist_ok=True)
    T = scene["num_frames"]
    for i in range(T):
        cv2.imwrite(os.path.join(d, "rgb", f"{i:04d}.png"),
                    cv2.cvtColor((scene["images"][i] * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(d, "depth", f"{i:04d}.png"),
                    (scene["depths"][i] * 1000).astype(np.uint16))
        cv2.imwrite(os.path.join(d, "mask", f"{i:04d}.png"),
                    (scene["masks"][i] * 255).astype(np.uint8))
    np.savetxt(os.path.join(d, "intrinsics.txt"), scene["K"])
    if with_gt_cameras:
        cam = {}
        K4 = np.eye(4)
        K4[:3, :3] = scene["K"]
        for i in range(T):
            c2w_cv = scene["poses"][i].astype(np.float64).copy()
            c2w_cv[:, 1] *= -1
            c2w_cv[:, 2] *= -1
            w2c = np.linalg.inv(c2w_cv)
            cam[f"world_mat_{i}"] = (K4 @ w2c).astype(np.float32)
            cam[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
        np.savez(os.path.join(d, "cameras_sphere.npz"), **cam)
    return d


def test_load_K_Rt_roundtrip():
    K = np.array([[450.0, 0, 180], [0, 450.0, 180], [0, 0, 1]])
    rng = np.random.default_rng(0)
    # random valid pose
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    c2w = np.eye(4)
    c2w[:3, :3] = Q
    c2w[:3, 3] = [0.3, -0.2, 2.5]
    w2c = np.linalg.inv(c2w)
    P = K @ w2c[:3, :4]
    K2, pose2 = load_K_Rt_from_P(P)
    np.testing.assert_allclose(K2[:3, :3], K, atol=1e-6)
    np.testing.assert_allclose(pose2, c2w, atol=1e-5)


def test_pose_init_recovers_consistent_object(tmp_path):
    # asymmetric object (two fused spheres) so ICP has a unique solution
    scene = make_synthetic_scene(num_frames=5, H=96, W=96, radius=0.45,
                                 motion=0.0)
    # carve a notch: zero out depth/mask in a fixed image region of frame 0?
    # better: rely on the partial orbit — a plain sphere is rotationally
    # ambiguous, so displace the sphere center off-origin for asymmetric
    # translation recovery
    d = _write_raw_dataset(tmp_path, scene)
    trans, radius = pose_init.run_pose_init(d, depth_scale=1000.0)
    assert trans.shape == (5, 4, 4)
    assert radius > 0
    assert os.path.exists(os.path.join(d, "cameras_sphere.npz"))
    # every w2c must be a rigid transform
    for w2c in trans:
        R = w2c[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    # functional check: backprojecting each frame's masked depth through the
    # recovered poses must land the object at a consistent location
    K = scene["K"]
    centroids = []
    for i in range(5):
        pts = pose_init.depth_mask_to_points(
            scene["depths"][i], scene["masks"][i],
            K[0, 0], K[1, 1], K[0, 2], K[1, 2])
        c2o = np.linalg.inv(trans[i])     # camera -> object frame
        pts_o = pts @ c2o[:3, :3].T + c2o[:3, 3]
        centroids.append(pts_o.mean(0))
    centroids = np.stack(centroids)
    spread = np.linalg.norm(centroids - centroids.mean(0), axis=-1).max()
    assert spread < 0.05, f"object drifts across frames: {spread}"


def test_virtual_cams_pipeline_produces_loadable_dataset(tmp_path):
    scene = make_synthetic_scene(num_frames=4, H=96, W=96, radius=0.4,
                                 motion=0.05)
    d = _write_raw_dataset(tmp_path, scene, with_gt_cameras=True)
    out = virtual_cams.preprocess_sequence(d, size_h=64, size_w=64)
    for sub in ("color_virt", "depth_raw_crop", "mask_virt", "poses_virt",
                "padding_mask"):
        assert len(os.listdir(os.path.join(d, sub))) == 4, sub
    assert os.path.exists(os.path.join(d, "K_virt.txt"))
    assert os.path.exists(os.path.join(d, "r_theta_phi.txt"))

    # virtual cameras look at the origin from the same distance
    for i in range(4):
        c2w = out["poses_virt"][i]
        center = c2w[:3, 3]
        fwd = c2w[:3, 2]
        np.testing.assert_allclose(center / np.linalg.norm(center), fwd,
                                   atol=1e-5)

    cfg = merge_defaults({"data": {"data_dir": d}})
    ds = DeformDataset(cfg)
    assert ds.num_frames == 4
    assert (ds.H, ds.W) == (64, 64)
    # the object is present in the cropped masks, roughly centered
    m = ds.masks[0]
    assert m.sum() > 50
    ys, xs = np.nonzero(m > 0.5)
    assert abs(ys.mean() - 32) < 8 and abs(xs.mean() - 32) < 8
