"""End-to-end 'tiny scene' integration test (SURVEY.md §4 plan): fit the
synthetic deforming sphere from RGB-D alone (no SDS) and assert the
reconstruction improves — the CPU analogue of the driver's 'snoopy
recon-loss-only fit' config."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morpheus_tpu import mesh_export, renderer
from morpheus_tpu.config import merge_defaults
from morpheus_tpu.data import dataset as data_lib
from morpheus_tpu.data.synthetic import make_synthetic_scene
from morpheus_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_config():
    return merge_defaults({
        "data": {"data_dir": "<synthetic>"},
        "exp": {"seed": 0},
        "train": {
            "n_epochs": 60, "warm_up_end": 10, "warm_up_steps": 5,
            "real_ray_num": 256, "real_freq": 1, "n_iters": 2,
            "lr": 5e-3,
            "normal_smoothness": 0.0,   # keep the CPU test fast
            "normal_smooth_3d": 0.0,
        },
        "model": {
            "bg_radius": 0.0,
            "grid_num_levels": 4, "grid_log2_hashmap_size": 12,
            "grid_desired_resolution": 48,
        },
        "render": {"step_size": 0.02},
        "tpu": {
            "max_samples_per_ray": 32, "march_steps": 128,
            "occ_resolution": 32, "occ_warmup_steps": 20,
            "occ_update_every": 8,
        },
    })


@pytest.fixture(scope="module")
def trained(tiny_config):
    # radius 0.3 is deliberately far from the geo-init sphere (radius ~0.4)
    # so the depth-improvement assertion is meaningful
    scene = make_synthetic_scene(num_frames=4, H=32, W=32, radius=0.3)
    ds = data_lib.DeformDataset(tiny_config, scene=scene)
    trainer = Trainer(tiny_config, ds)
    state0 = trainer.state
    trainer.train(max_epochs=60, log=lambda *a: None)
    return tiny_config, ds, trainer, state0


def _depth_l1(trainer, ds, params, occ, frame=0):
    data = trainer.data
    rays = data_lib.full_frame_rays(data, ds.num_frames, frame)
    out = renderer.render_rays(
        params, trainer.spec, occ, jax.random.PRNGKey(0),
        rays["rays_o"], rays["rays_d"], rays["rays_t"], rays["rays_id"],
        trainer.rcfg, bg_color=1.0, train=False)
    gt_depth = np.asarray(data["depths"][frame])
    # opacity-normalized expected depth (volume depth underestimates where
    # opacity < 1; the reference evaluates mesh-rendered depth instead)
    pred = np.asarray(out["depth"]) / np.maximum(np.asarray(out["opacity"]),
                                                 1e-3)
    m = gt_depth > 0
    return float(np.abs(pred[m] - gt_depth[m]).mean())


def test_depth_l1_improves(trained):
    cfg, ds, trainer, state0 = trained
    l1_before = _depth_l1(trainer, ds, state0.params, trainer.state.occ)
    l1_after = _depth_l1(trainer, ds, trainer.state.params, trainer.state.occ)
    assert l1_after < 0.15, f"depth L1 too high after training: {l1_after}"
    assert l1_after < 0.6 * l1_before, (l1_before, l1_after)


def test_mask_renders_object(trained):
    cfg, ds, trainer, _ = trained
    data = trainer.data
    rays = data_lib.full_frame_rays(data, ds.num_frames, 0)
    out = renderer.render_rays(
        trainer.state.params, trainer.spec, trainer.state.occ,
        jax.random.PRNGKey(1), rays["rays_o"], rays["rays_d"], rays["rays_t"],
        rays["rays_id"], trainer.rcfg, bg_color=1.0, train=False)
    gt_mask = np.asarray(data["masks"][0]) > 0.5
    pred_op = np.asarray(out["opacity"])
    # IoU of thresholded opacity vs GT mask
    pred = pred_op > 0.5
    iou = (pred & gt_mask).sum() / max((pred | gt_mask).sum(), 1)
    assert iou > 0.7, f"IoU {iou}"


def test_mesh_matches_sphere(trained, tmp_path):
    cfg, ds, trainer, _ = trained
    verts, faces = mesh_export.export_mesh(
        trainer.state.params, trainer.spec, str(tmp_path / "mesh.ply"),
        resolution=48, t=0.0, color_mesh=False)
    assert len(verts) > 100
    r = np.linalg.norm(verts, axis=-1)
    # the synthetic object is a sphere of radius 0.3 (center wobbles by ±0.1)
    assert abs(np.median(r) - 0.3) < 0.12, f"median radius {np.median(r)}"


def test_checkpoint_roundtrip(trained, tmp_path):
    cfg, ds, trainer, _ = trained
    p = str(tmp_path / "ckpt.pkl")
    trainer.save_ckpt(p)
    t2 = Trainer(cfg, ds)
    t2.load_ckpt(p)
    assert t2.epoch == trainer.epoch
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kill_and_resume_is_exact(tiny_config, tmp_path):
    """Checkpoint mid-run, rebuild a fresh trainer, resume — params must match
    an unbroken run bit-for-bit (key + host_step round-trip through the ckpt)."""
    scene = make_synthetic_scene(num_frames=4, H=32, W=32, radius=0.3)

    ds = data_lib.DeformDataset(tiny_config, scene=scene)
    t_full = Trainer(tiny_config, ds)
    for ep in range(1, 7):
        t_full.epoch = ep
        t_full.train_one_epoch()

    t_a = Trainer(tiny_config, ds)
    for ep in range(1, 4):
        t_a.epoch = ep
        t_a.train_one_epoch()
    ckpt = str(tmp_path / "mid.pkl")
    t_a.save_ckpt(ckpt)

    t_b = Trainer(tiny_config, ds)
    t_b.load_ckpt(ckpt)
    assert t_b.epoch == 3
    for ep in range(4, 7):
        t_b.epoch = ep
        t_b.train_one_epoch()

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        t_full.state.params, t_b.state.params)


def test_budget_compaction_matches_full_eval(trained):
    """With an ample budget, compacted rendering must equal the identity flat
    path exactly on eval outputs (train=False: no RNG-shape divergence)."""
    import dataclasses
    cfg, ds, trainer, _ = trained
    data = trainer.data
    rays = data_lib.full_frame_rays(data, ds.num_frames, 0)
    args = (rays["rays_o"], rays["rays_d"], rays["rays_t"], rays["rays_id"])

    rc_off = dataclasses.replace(trainer.rcfg, sample_budget=0)
    rc_on = dataclasses.replace(trainer.rcfg,
                                sample_budget=trainer.rcfg.max_samples - 1)
    out0 = renderer.render_rays(trainer.state.params, trainer.spec,
                                trainer.state.occ, jax.random.PRNGKey(3),
                                *args, rc_off, bg_color=1.0, train=False)
    out1 = renderer.render_rays(trainer.state.params, trainer.spec,
                                trainer.state.occ, jax.random.PRNGKey(3),
                                *args, rc_on, bg_color=1.0, train=False)
    for k in ("image", "depth", "opacity"):
        np.testing.assert_allclose(np.asarray(out1[k]), np.asarray(out0[k]),
                                   rtol=2e-4, atol=2e-5)
